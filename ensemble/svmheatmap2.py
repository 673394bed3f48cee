#!/usr/bin/env python
"""Per-SNR disagreement-set accuracy for linear SVM fusers across C.

Parity: reference ensemble/svmheatmap2.py.

    python ensemble/svmheatmap2.py <lm_prefix> <nn_prefix> <svm_dir> <out.csv>
"""

import argparse
import csv
import os
import pickle

import numpy as np

SNRS = [
    "out2_snr-6", "out2_snr-4", "out2_snr-2", "out2_snr0",
    "out2_snr2", "out2_snr4", "out2_snr6", "out2_snr8", "out2", "mirex",
]


def main():
    args = argparse.ArgumentParser()
    args.add_argument("lm_npy")
    args.add_argument("nn_npy")
    args.add_argument("svms")
    args.add_argument("out")
    args = args.parse_args()

    rows = [["C"] + SNRS]
    for C in ["0.01", "0.1"] + [str(10**x) for x in range(0, 11)]:
        rows.append([C])
        for snr in SNRS:
            nn = np.load(args.nn_npy + snr + ".npy")
            lm = np.load(args.lm_npy + snr + ".npy")
            select = nn[:, 1] + lm[:, 1] == 1
            x2 = np.stack([nn[:, 0], lm[:, 0]], axis=1)
            with open(os.path.join(args.svms, "lin_C%s.pkl" % C), "rb") as fin:
                model = pickle.load(fin)
            pred = model.predict(x2)
            ok = np.where(pred, nn[:, 1], lm[:, 1])[select]
            rows[-1].append(float(np.mean(ok)))
    with open(args.out, "w", newline="\n") as fout:
        csv.writer(fout).writerows(rows)


if __name__ == "__main__":
    main()
