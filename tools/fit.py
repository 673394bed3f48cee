#!/usr/bin/env python
"""Fit sigmoid accuracy-vs-SNR curves and plot them.

Parity: reference tools/fit.py — holds the thesis headline numbers
(BASELINE.md) and fits L / (1 + exp(-k (x - x0))) to each system's
accuracy curve.  Accepts extra curves from CSV (snr, acc%) to compare a
new model against the baselines.
"""

import argparse
import csv

import numpy as np
from scipy.optimize import curve_fit

SNR = np.array([-6, -4, -2, 0, 2, 4, 6, 8])
BASELINES = {
    "lm": [71.10, 79.65, 86.85, 91.10, 93.30, 95.20, 96.60, 97.70],
    "nn old": [59.05, 75.20, 86.40, 92.55, 95.95, 97.30, 98.05, 99.00],
    "nn new": [81.70, 89.55, 93.30, 95.60, 97.30, 98.10, 98.60, 98.90],
    "svm": [83.75, 90.30, 93.85, 96.05, 97.55, 98.40, 98.80, 99.05],
}


def sigmoid(x, L, x0, k):
    return L / (1 + np.exp(-k * (x - x0)))


def main():
    args = argparse.ArgumentParser()
    args.add_argument("--extra", help="CSV with columns snr,acc_percent")
    args.add_argument("--out", help="save plot instead of showing")
    args = args.parse_args()

    curves = {k: (SNR, np.array(v) * 0.01) for k, v in BASELINES.items()}
    if args.extra:
        with open(args.extra) as fin:
            reader = csv.reader(fin)
            next(reader)
            pts = np.array([[float(a), float(b)] for a, b in reader])
        curves["this model"] = (pts[:, 0], pts[:, 1] * 0.01)

    fits = {}
    for name, (snr, acc) in curves.items():
        p0 = [max(acc), float(np.median(snr)), 1]
        popt, _ = curve_fit(sigmoid, snr, acc, p0, method="dogbox")
        fits[name] = popt
        print(name, popt)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return  # fits printed; plotting optional

    xs = np.linspace(-7, 10, 100)
    for name, (snr, acc) in curves.items():
        plt.plot(xs, sigmoid(xs, *fits[name]), label=name)
        plt.scatter(snr, acc)
    plt.xlabel("SNR (dB)")
    plt.ylabel("accuracy")
    plt.legend()
    if args.out:
        plt.savefig(args.out, dpi=150)
        print("saved", args.out)
    else:
        plt.show()


if __name__ == "__main__":
    main()
