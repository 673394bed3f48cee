#!/usr/bin/env python
"""End-to-end thesis-ensemble demo on the synthetic corpus: extract NN +
landmark scores per SNR, train the SVM fusers on the disagreement set,
and report per-SNR fused accuracy — the reference's ensemble flow
(extractscore -> lmscore -> svmtrain -> svmval) composed over this
repo's own two systems, zero external data or repos.

    python ensemble/fuse_synth.py [--model synth] [--lm lm]
                                  [--dataset synth2s] [--train-frac 0.5]

Expects prior runs of:
    ./testall.sh <model> <dataset> -build -match_snr
    ./testall.sh <lm>    <dataset> -build -match_snr

Queries are split per SNR: the first train-frac of each set trains the
SVM (concatenated across SNRs, like the reference's mixed-SNR training
set), the rest evaluates.  Prints NN / landmark / fused song accuracy
per SNR for the best linear C on the pooled eval split.
"""

import argparse
import os
import pickle
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SNRS = (-6, -4, -2, 0, 2, 4, 6, 8)


def run(script, *a):
    subprocess.run([sys.executable, os.path.join(HERE, script), *a],
                   check=True, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="synth")
    ap.add_argument("--lm", default="lm")
    ap.add_argument("--dataset", default="synth2s")
    ap.add_argument("--train-frac", type=float, default=0.5)
    ap.add_argument("--out", default="out/ensemble")
    ap.add_argument("--db", default=None,
                    help="DB dir whose songList defines the track-id "
                    "space (default: out/dbs/<model>_<base dataset> "
                    "with query-length suffixes stripped, matching "
                    "testall.sh db_name)")
    args = ap.parse_args()

    base = args.dataset
    for suffix in ("2s", "3s", "5s"):
        if base == "synth" + suffix:
            base = "synth"
    db_dir = args.db or os.path.join("out", "dbs",
                                     "%s_%s" % (args.model, base))
    songlist = os.path.join(db_dir, "songList.txt")
    os.makedirs(args.out, exist_ok=True)

    nn, lm = {}, {}
    for snr in SNRS:
        gt = os.path.join("out", "queries",
                          "%s_snr%d" % (args.dataset, snr), "expected.csv")
        nn_pred = os.path.join("out", "results", "%s_%s_snr%d.txt"
                               % (args.model, args.dataset, snr))
        lm_pred = os.path.join("out", "results", "%s_%s_snr%d.txt"
                               % (args.lm, args.dataset, snr))
        nn_npy = os.path.join(args.out, "nn_snr%d.npy" % snr)
        lm_npy = os.path.join(args.out, "lm_snr%d.npy" % snr)
        run("extractscore.py", songlist, gt, nn_pred, nn_npy)
        run("lmscore.py", songlist, gt, lm_pred, lm_npy)
        nn[snr] = np.load(nn_npy)
        lm[snr] = np.load(lm_npy)

    k = lambda a: int(a.shape[0] * args.train_frac)
    nn_tr = np.concatenate([nn[s][: k(nn[s])] for s in SNRS])
    lm_tr = np.concatenate([lm[s][: k(lm[s])] for s in SNRS])
    np.save(os.path.join(args.out, "nn_train.npy"), nn_tr)
    np.save(os.path.join(args.out, "lm_train.npy"), lm_tr)
    svm_dir = os.path.join(args.out, "svms")
    run("svmtrain.py", os.path.join(args.out, "lm_train.npy"),
        os.path.join(args.out, "nn_train.npy"), svm_dir)

    # model selection on the pooled eval split (linear family, like the
    # thesis headline row)
    nn_ev = np.concatenate([nn[s][k(nn[s]):] for s in SNRS])
    lm_ev = np.concatenate([lm[s][k(lm[s]):] for s in SNRS])

    def fused_acc(model, nn_a, lm_a):
        pred = model.predict(np.stack([nn_a[:, 0], lm_a[:, 0]], axis=1))
        return float(np.mean(np.where(pred, nn_a[:, 1], lm_a[:, 1])))

    best = None
    for name in sorted(os.listdir(svm_dir)):
        if not name.startswith("lin_") or not name.endswith(".pkl"):
            continue
        with open(os.path.join(svm_dir, name), "rb") as f:
            model = pickle.load(f)
        acc = fused_acc(model, nn_ev, lm_ev)
        if best is None or acc > best[1]:
            best = (name, acc, model)
    name, acc, model = best
    print("\nbest linear fuser on pooled eval: %s acc=%.4f" % (name, acc))

    rows = []
    for snr in SNRS:
        a, b = nn[snr][k(nn[snr]):], lm[snr][k(lm[snr]):]
        rows.append((snr, float(a[:, 1].mean()), float(b[:, 1].mean()),
                     fused_acc(model, a, b)))
    print("\n| SNR (dB) | " + " | ".join(str(s) for s, *_ in rows) + " |")
    print("|---|" + "---|" * len(rows))
    for label, i in (("NN", 1), ("landmark", 2), ("SVM ensemble", 3)):
        print("| %s song top-1 %% | " % label
              + " | ".join("%.2f" % (r[i] * 100) for r in rows) + " |")


if __name__ == "__main__":
    main()
