#!/usr/bin/env python
"""Train SVM fusers on the NN/landmark disagreement set.

Parity: reference ensemble/svmtrain.py — select queries where exactly one
system is correct, features = (nn_score, lm_score), label = nn correct;
sweep linear C in 10^[-2, 10] and RBF (C, gamma) grids, pickling each.

    python ensemble/svmtrain.py <lm.npy> <nn.npy> <out_dir>
"""

import argparse
import os
import pickle

import numpy as np
from sklearn.svm import SVC


def main():
    args = argparse.ArgumentParser()
    args.add_argument("lm_npy")
    args.add_argument("nn_npy")
    args.add_argument("out")
    args = args.parse_args()

    nn = np.load(args.nn_npy)
    lm = np.load(args.lm_npy)
    select = nn[:, 1] + lm[:, 1] == 1  # disagreement set
    x = np.stack([nn[select, 0], lm[select, 0]], axis=1)
    y = nn[select, 1]
    print("nn wins", int(np.sum(y == 1)))
    print("landmark wins", int(np.sum(y == 0)))

    os.makedirs(args.out, exist_ok=True)
    # max_iter caps the extreme-C fits: libsvm runs UNBOUNDED by
    # default and C>=1e4 on the overlapping disagreement set never
    # converges (observed: minutes-to-stuck per fit); the capped fit
    # is equivalent for model selection, which scores on the eval
    # split (fuse_synth.py / svmval.py)
    print("Linear SVM")
    for C in range(-2, 11):
        model = SVC(C=10**C, kernel="linear", max_iter=2_000_000)
        model.fit(x, y)
        acc = np.mean(model.predict(x) == y)
        print("C={} train acc={:.4f}".format(10**C, acc))
        with open(os.path.join(args.out, "lin_C{}.pkl".format(10**C)), "wb") as fout:
            pickle.dump(model, fout)

    print("RBF SVM")
    for C in range(-2, 11):
        for gamma in range(-9, 4):
            model = SVC(C=10**C, kernel="rbf", gamma=10**gamma,
                        max_iter=2_000_000)
            model.fit(x, y)
            acc = np.mean(model.predict(x) == y)
            print("C={} gamma={} train acc={:.4f}".format(10**C, 10**gamma, acc))
            name = "rbf_C{}_gamma{}.pkl".format(10**C, 10**gamma)
            with open(os.path.join(args.out, name), "wb") as fout:
                pickle.dump(model, fout)


if __name__ == "__main__":
    main()
