#!/usr/bin/env python
"""Render an svmheatmap CSV as a heatmap image (parity:
ensemble/drawheatmap.py; gated on matplotlib).

    python ensemble/drawheatmap.py <heatmap.csv> [out.png]
"""

import argparse
import csv

import numpy as np


def main():
    args = argparse.ArgumentParser()
    args.add_argument("csv")
    args.add_argument("out", nargs="?")
    args = args.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        raise SystemExit("matplotlib is required for plotting")

    with open(args.csv) as fin:
        reader = csv.reader(fin)
        header = next(reader)
        rows = list(reader)
    labels = [r[0] for r in rows]
    data = np.array([[float(v) for v in r[1:]] for r in rows])

    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(data, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(header) - 1), header[1:], rotation=45, ha="right")
    ax.set_yticks(range(len(labels)), labels)
    ax.set_ylabel(header[0])
    fig.colorbar(im)
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            ax.text(j, i, "%.3f" % data[i, j], ha="center", va="center", fontsize=6)
    out = args.out or args.csv + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print("saved", out)


if __name__ == "__main__":
    main()
