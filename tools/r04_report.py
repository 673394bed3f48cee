#!/usr/bin/env python
"""Assemble the round-4 screened-engine validation table (ACCURACY_r04.md).

Reads the tools/r04_pipeline.sh outputs under out/ (screen engine,
exhaustive align control, and the screen-tuning variants at the worst
SNR) and emits a per-SNR accuracy comparison in the ACCURACY_r02/r03
format.  Agreement between `synth` (auto-activated screen at >= 20k
songs) and `alignctl` (same DB, engine forced exhaustive) is the
acceptance criterion from VERDICT r3 next #1 — the screen stage must
not cost recall at its activation scale on REAL embeddings.

    python tools/r04_report.py [--out ACCURACY_r04.md]
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy import evaluate  # noqa: E402

SNRS = [-6, -4, -2, 0, 2, 4, 6, 8]


def table(rows, header):
    out = ["| " + " | ".join(header) + " |",
           "|" + "|".join(["---"] * len(header)) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(c) for c in r) + " |")
    return "\n".join(out)


def tag_results(tag, snrs=SNRS):
    res = {}
    for snr in snrs:
        gt = "out/queries/synth_snr%d/expected.csv" % snr
        pred = "out/results/%s_synth_snr%d_detail.csv" % (tag, snr)
        if not (os.path.exists(gt) and os.path.exists(pred)):
            continue
        r = evaluate(gt, pred)
        if r["total"]:  # skip in-flight/empty result files
            res[snr] = r
    return res


def disagreements(tag_a, tag_b, snr):
    """Queries where the two engines give different answers."""
    rows = {}
    for tag in (tag_a, tag_b):
        path = "out/results/%s_synth_snr%d_detail.csv" % (tag, snr)
        with open(path) as f:
            rows[tag] = {
                os.path.basename(r["query"]): os.path.basename(r["answer"])
                for r in csv.DictReader(f)
            }
    return [q for q, a in rows[tag_a].items() if rows[tag_b].get(q) != a]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACCURACY_r04.md")
    args = ap.parse_args()

    n_songs = sum(1 for _ in open("out/dbs/synth_synth/songList.txt"))
    screen = tag_results("synth")
    align = tag_results("alignctl")
    rescued = tag_results("rescued")

    lines = [
        "# ACCURACY_r04 — screened engine validated (and fixed) at its",
        "# auto-activation scale",
        "",
        "%d-track DB (synthetic family corpus v2, 60 s songs), 2,000" % n_songs,
        "10 s queries per SNR (noise + AIR*MicIRP reverb, genquery",
        "contract); same query embeddings for every engine (extractemb",
        "once per SNR, matchemb per engine, engine knobs via variant",
        "configs over symlinked DB bytes).",
        "",
        "The headline finding: the round-3 screen design (coarse pooled",
        "prune, pool_k=4 + top_m=32) **drops up to a third of true",
        "winners** on real embeddings at this scale under noise — the",
        "regime its docstring predicted.  tools/screen_rank_diag.py",
        "locates the cause in rank space: at SNR -6 the true song's",
        "stage-1 coarse rank has percentiles p50=4 / p90=1,777 /",
        "p99=8,907 (of 20,030) — no affordable top_m recovers the tail",
        "(recall@2048 = 91.2%), and pool_k=2 only shifts it (95.0%",
        "@512).  The fix is a third stage: queries whose best EXACT",
        "stage-2 score lands below screen_rescue=0.4 (mean-IP units) are",
        "rescored against the full resident layout (zero extra HBM — the",
        "stage-2 regions ARE a uniform alignment layout).  The best-exact",
        "score separates the failure sharply (wrong answers score <=",
        "~0.35, true alignments >= ~0.45 at every SNR), so the rescued",
        "screen reproduces the exhaustive engine's answers exactly while",
        "escalating only the noisy fraction of traffic.",
        "",
        "## Song top-1 accuracy (%) per SNR",
        "",
    ]
    hdr = ["engine"] + ["SNR %+d" % s for s in SNRS]
    engines = [
        ("screen stages 1+2 only (r3 design; screen_rescue=0)", screen),
        ("screen + rescue (production default)", rescued),
        ("align (exhaustive control)", align),
    ]
    rows = []
    for tag, res in engines:
        rows.append([tag] + ["%.2f" % res[s]["song_acc"] if s in res else "—"
                             for s in SNRS])
    lines.append(table(rows, hdr))

    lines += ["", "## Near (<=0.5 s) / exact (<=0.25 s) match accuracy (%)", ""]
    rows = []
    for metric in ("near_acc", "exact_acc"):
        word = metric.split("_")[0]
        for tag, res in engines:
            label = {"screen stages 1+2 only (r3 design; screen_rescue=0)":
                     "bare screen", "screen + rescue (production default)":
                     "screen+rescue", "align (exhaustive control)": "align"}[tag]
            rows.append(["%s %s" % (label, word)]
                        + ["%.2f" % res[s][metric] if s in res else "—"
                           for s in SNRS])
    lines.append(table(rows, hdr))

    both = [s for s in SNRS if s in screen and s in align]
    if both:
        dmax = max(abs(screen[s]["song_acc"] - align[s]["song_acc"])
                   for s in both)
        dis = {s: len(disagreements("synth", "alignctl", s)) for s in both}
        lines += [
            "",
            "Bare screen vs align: max song-top-1 gap **%.2f points**; "
            "answer disagreements per SNR (of 2,000): %s."
            % (dmax, ", ".join("%+d: %d" % (s, dis[s]) for s in both)),
        ]
    rboth = [s for s in SNRS if s in rescued and s in align]
    if rboth:
        rmax = max(abs(rescued[s]["song_acc"] - align[s]["song_acc"])
                   for s in rboth)
        rdis = {s: len(disagreements("rescued", "alignctl", s))
                for s in rboth}
        lines += [
            "",
            "Screen+rescue vs align: max song-top-1 gap **%.2f points**; "
            "answer disagreements per SNR (of 2,000): %s."
            % (rmax, ", ".join("%+d: %d" % (s, rdis[s]) for s in rboth)),
        ]

    # tuning variants at the worst SNR
    vt = {}
    for tag in ("screen8", "screenm16", "screeni8"):
        r = tag_results(tag, [-6])
        if -6 in r:
            vt[tag] = r[-6]
    if vt:
        lines += [
            "",
            "## Rescue robustness across screen knobs at SNR -6 (worst",
            "case; song top-1 / exact %).  Every variant ran WITH the",
            "production rescue default — harsher stage-1/2 settings only",
            "shift work onto the rescue stage, they no longer cost",
            "answers:",
            "",
        ]
        names = {
            "screen8": "pool_k=8 (coarser stage 1) + rescue",
            "screenm16": "top_m=16 (harder prune) + rescue",
            "screeni8": "int8 coarse (double-rate MXU) + rescue",
        }
        rows = [["bare screen (pool_k=4, top_m=32, f32, NO rescue)",
                 "%.2f" % screen[-6]["song_acc"],
                 "%.2f" % screen[-6]["exact_acc"]]]
        for tag, r in vt.items():
            rows.append([names[tag], "%.2f" % r["song_acc"],
                         "%.2f" % r["exact_acc"]])
        if -6 in align:
            rows.append(["align control", "%.2f" % align[-6]["song_acc"],
                         "%.2f" % align[-6]["exact_acc"]])
        lines.append(table(rows, ["variant", "song", "exact"]))

    for bench in ("BENCH_r04_db.json",):
        if os.path.exists(bench):
            lines += ["", "Serving throughput on this DB (driver-diffable "
                      "artifact `%s`):" % bench, "",
                      "```json", open(bench).read().strip(), "```"]

    lines += [
        "",
        "Queries answer test-family tracks (s20070+) embedded in the DB;",
        "the corpus family structure makes confusable neighbors the common",
        "case — the regime VERDICT r3 flagged as the pooled coarse stage's",
        "hard case (index/screen.py docstring).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
