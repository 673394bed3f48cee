#!/usr/bin/env python
"""Seeded random train/test split of a CSV (parity: reference
tools/traintestsplit.py — seed 1, sorted sampled indices, optional
--portion mode splitting by ratio)."""

import argparse
import csv
import random


def main():
    argp = argparse.ArgumentParser()
    argp.add_argument("--csv", default="out.csv")
    argp.add_argument("--train-size", type=int)
    argp.add_argument("--train", default="train.csv")
    argp.add_argument("--test-size", type=int)
    argp.add_argument("--test", default="test.csv")
    argp.add_argument("-p", "--portion", action="store_true")
    args = argp.parse_args()

    random.seed(1)
    with open(args.csv, "r", encoding="utf8") as fin:
        reader = csv.reader(fin)
        firstrow = next(reader)
        data = list(reader)

    n = len(data)
    if args.portion:
        total = args.train_size + args.test_size
        train_size = n * args.train_size // total
        test_size = n - train_size
    else:
        if args.train_size is None:
            train_size = n // 2 if args.test_size is None else n - args.test_size
        else:
            train_size = args.train_size
        test_size = n - train_size if args.test_size is None else args.test_size
    print("There are %d data" % n)
    assert train_size + test_size <= n, "Not enough data for train/test split"

    train_index = sorted(random.sample(range(n), train_size))
    rest = sorted(set(range(n)) - set(train_index))
    test_index = sorted(random.sample(rest, test_size))

    for path, idx, label in (
        (args.train, train_index, "train"),
        (args.test, test_index, "test"),
    ):
        with open(path, "w", encoding="utf8", newline="\n") as fout:
            writer = csv.writer(fout)
            if firstrow:
                writer.writerow(firstrow)
            writer.writerows(data[i] for i in idx)
        print("%s data: %d" % (label, len(idx)))


if __name__ == "__main__":
    main()
