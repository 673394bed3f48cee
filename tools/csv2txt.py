#!/usr/bin/env python
"""CSV file list -> absolute-path txt list (parity: tools/csv2txt.py)."""

import argparse
import csv
import os


def main():
    args = argparse.ArgumentParser()
    args.add_argument("csv")
    args.add_argument("--dir", required=True)
    args.add_argument("--out")
    args = args.parse_args()
    out = args.out or args.csv + ".txt"
    with open(args.csv, "r", encoding="utf8") as fin, open(
        out, "w", encoding="utf8"
    ) as fout:
        reader = csv.reader(fin)
        next(reader)
        for row in reader:
            fout.write(os.path.abspath(os.path.join(args.dir, row[0])) + "\n")


if __name__ == "__main__":
    main()
