#!/usr/bin/env python
"""Aggregate testall.sh's per-SNR accuracy results into a markdown table.

    python tools/snr_report.py <model> <dataset> [-o ACCURACY.md]

Reads out/queries/<dataset>_snr<k>/expected.csv and
out/results/<model>_<dataset>_snr<k>_detail.csv for SNR in {-6..8} (the
reference's evaluation grid, genall.sh:1-4) and emits song / near
(<=0.5 s) / exact (<=0.25 s) top-1 accuracy per SNR.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accuracy import evaluate  # noqa: E402

SNRS = (-6, -4, -2, 0, 2, 4, 6, 8)


def collect(model: str, dataset: str) -> dict[int, dict]:
    rows = {}
    for snr in SNRS:
        expected = os.path.join(
            "out", "queries", "%s_snr%d" % (dataset, snr), "expected.csv"
        )
        detail = os.path.join(
            "out", "results", "%s_%s_snr%d_detail.csv" % (model, dataset, snr)
        )
        if not os.path.exists(detail):
            # landmark results carry their CSV as <result>.txt.csv
            detail = os.path.join(
                "out", "results", "%s_%s_snr%d.txt.csv" % (model, dataset, snr)
            )
        rows[snr] = evaluate(expected, detail)
    return rows


def render(model: str, dataset: str, rows: dict[int, dict]) -> str:
    out = [
        "| SNR (dB) | " + " | ".join(str(s) for s in SNRS) + " |",
        "|---|" + "---|" * len(SNRS),
    ]
    for key, label in (("song_acc", "song top-1 %"),
                       ("near_acc", "near (<=0.5 s) %"),
                       ("exact_acc", "exact (<=0.25 s) %")):
        out.append(
            "| %s | " % label
            + " | ".join("%.2f" % rows[s][key] for s in SNRS) + " |"
        )
    n = rows[SNRS[0]]["total"]
    out.append("")
    out.append("%d queries per SNR; model `%s`, dataset `%s`." % (n, model, dataset))
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("dataset")
    ap.add_argument("-o", "--out")
    args = ap.parse_args()
    table = render(args.model, args.dataset, collect(args.model, args.dataset))
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
