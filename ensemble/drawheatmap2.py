#!/usr/bin/env python
"""Render an svmheatmap2 C-sweep CSV (rows = SVM C values, columns =
evaluation sets) as an annotated heatmap with log-scale C labels.
Parity: reference ensemble/drawheatmap2.py; gated on matplotlib.

    python ensemble/drawheatmap2.py <heatmap.csv> [out.png]
"""

import argparse
import csv
import math


def main() -> None:
    args = argparse.ArgumentParser()
    args.add_argument("csv")
    args.add_argument("out", nargs="?")
    args = args.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
    except ImportError:
        raise SystemExit("matplotlib is required for plotting")

    with open(args.csv) as fin:
        reader = csv.reader(fin)
        header = next(reader)
        rows = list(reader)
    c_values = [float(r[0]) for r in rows]
    data = np.array([[float(v) for v in r[1:]] for r in rows])
    # C spans 0.01 .. 1e10 — label as powers of ten like the reference
    labels = ["$10^{%d}$" % round(math.log10(c)) for c in c_values]

    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(data, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(header) - 1), header[1:], rotation=45, ha="right")
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("validation set")
    ax.set_ylabel("C")
    fig.colorbar(im)
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            ax.text(j, i, "%.4f" % data[i, j], ha="center", va="center",
                    fontsize=5)
    out = args.out or args.csv + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print("saved", out)


if __name__ == "__main__":
    main()
