#!/usr/bin/env python
"""Build the 100k-dummy-track DB list from fma_full.

Parity: reference tools/fma_full.py — fma_full tracks with 30 s <=
duration <= 3600 s minus fma_medium test tracks, seed-3 shuffle, first
100000, with the test tracks appended as queries.
"""

import csv
import random


def main():
    dummys = set()
    with open("lists/fma_full.csv", "r") as fin:
        reader = csv.reader(fin)
        next(reader)
        for row in reader:
            du = float(row[1])
            if 30 <= du <= 3600:
                dummys.add(row[0])

    querys = []
    with open("lists/fma_medium_test.csv", "r") as fin:
        reader = csv.reader(fin)
        next(reader)
        for row in reader:
            dummys.discard(row[0])
            querys.append(row[0])

    dummys = list(dummys)
    random.seed(3)
    random.shuffle(dummys)
    dummys = sorted(dummys[:100000])
    querys.sort()

    with open("lists/fma_dummy_large.txt", "w") as fout:
        fout.writelines("../pfann_dataset/fma_full/" + x + "\n" for x in dummys)
        fout.writelines("../pfann_dataset/fma_medium/" + x + "\n" for x in querys)


if __name__ == "__main__":
    main()
