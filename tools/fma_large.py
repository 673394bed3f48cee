#!/usr/bin/env python
"""Build the 10k-dummy-track evaluation DB lists from FMA CSVs.

Parity: reference tools/fma_large.py — fma_large tracks >= 29.9 s minus
anything in the fma_medium train/val/test splits, seed-3 shuffle, first
10000, plus the val (out1) / test (out2) tracks appended.
"""

import csv
import random


def read_col(path):
    with open(path, "r") as fin:
        reader = csv.reader(fin)
        next(reader)
        return [row for row in reader]


def main():
    dummys = {row[0] for row in read_col("lists/fma_large.csv")
              if float(row[1]) >= 29.9}
    for row in read_col("lists/fma_medium_train.csv"):
        dummys.discard(row[0])
    vals = []
    for row in read_col("lists/fma_medium_val.csv"):
        dummys.discard(row[0])
        vals.append(row[0])
    tests = []
    for row in read_col("lists/fma_medium_test.csv"):
        dummys.discard(row[0])
        tests.append(row[0])

    dummys = list(dummys)
    random.seed(3)
    random.shuffle(dummys)
    dummys = sorted(dummys[:10000])
    vals.sort()
    tests.sort()

    with open("lists/fma_out1.txt", "w") as fout:
        fout.writelines("../pfann_dataset/fma_large/" + x + "\n" for x in dummys)
        fout.writelines("../pfann_dataset/fma_medium/" + x + "\n" for x in vals)
    with open("lists/fma_out2.txt", "w") as fout:
        fout.writelines("../pfann_dataset/fma_large/" + x + "\n" for x in dummys)
        fout.writelines("../pfann_dataset/fma_medium/" + x + "\n" for x in tests)


if __name__ == "__main__":
    main()
