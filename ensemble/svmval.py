#!/usr/bin/env python
"""Evaluate every pickled SVM fuser on a (lm, nn) score set.

Parity: reference ensemble/svmval.py — the fused answer takes the NN
answer when the SVM predicts 1 else the landmark answer; accuracy is the
mean correctness over all queries.

    python ensemble/svmval.py <lm.npy> <nn.npy> <svm_dir>
"""

import argparse
import os
import pickle

import numpy as np


def main():
    args = argparse.ArgumentParser()
    args.add_argument("lm_npy")
    args.add_argument("nn_npy")
    args.add_argument("svms")
    args = args.parse_args()

    nn = np.load(args.nn_npy)
    lm = np.load(args.lm_npy)
    select = nn[:, 1] + lm[:, 1] == 1
    print("nn wins", int(np.sum(nn[select, 1] == 1)))
    print("landmark wins", int(np.sum(nn[select, 1] == 0)))

    x2 = np.stack([nn[:, 0], lm[:, 0]], axis=1)
    for svm in sorted(os.listdir(args.svms)):
        if not svm.endswith(".pkl"):
            continue
        with open(os.path.join(args.svms, svm), "rb") as fin:
            model = pickle.load(fin)
        pred = model.predict(x2)
        ok = np.where(pred, nn[:, 1], lm[:, 1])
        print("%s acc=%.4f" % (svm, np.mean(ok)))


if __name__ == "__main__":
    main()
