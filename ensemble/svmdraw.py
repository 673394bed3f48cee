#!/usr/bin/env python
"""Plot the SVM decision boundary over the (nn, lm) score plane.

Parity: reference ensemble/svmdraw.py (plotting gated on matplotlib).

    python ensemble/svmdraw.py <lm.npy> <nn.npy> <svm.pkl> [out.png]
"""

import argparse
import pickle

import numpy as np


def main():
    args = argparse.ArgumentParser()
    args.add_argument("lm_npy")
    args.add_argument("nn_npy")
    args.add_argument("svm")
    args.add_argument("out", nargs="?")
    args = args.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        raise SystemExit("matplotlib is required for plotting")

    nn = np.load(args.nn_npy)
    lm = np.load(args.lm_npy)
    select = nn[:, 1] + lm[:, 1] == 1
    x = np.stack([nn[select, 0], lm[select, 0]], axis=1)
    y = nn[select, 1]
    with open(args.svm, "rb") as fin:
        model = pickle.load(fin)

    xx, yy = np.meshgrid(
        np.linspace(x[:, 0].min(), x[:, 0].max(), 200),
        np.linspace(x[:, 1].min(), x[:, 1].max(), 200),
    )
    zz = model.predict(np.stack([xx.ravel(), yy.ravel()], axis=1)).reshape(xx.shape)
    plt.contourf(xx, yy, zz, alpha=0.3)
    plt.scatter(x[y == 1, 0], x[y == 1, 1], s=4, label="nn wins")
    plt.scatter(x[y == 0, 0], x[y == 0, 1], s=4, label="landmark wins")
    plt.xlabel("nn score")
    plt.ylabel("landmark score")
    plt.legend()
    out = args.out or "svmdraw.png"
    plt.savefig(out, dpi=150)
    print("saved", out)


if __name__ == "__main__":
    main()
