#!/usr/bin/env python
"""Filter a listaudio CSV by duration (parity: tools/filterduration.py)."""

import argparse
import csv


def main():
    argp = argparse.ArgumentParser()
    argp.add_argument("--csv", required=True)
    argp.add_argument("--min-len", type=float, default=0)
    argp.add_argument("--max-len", type=float, default=float("inf"))
    argp.add_argument("--out", required=True)
    args = argp.parse_args()

    out = []
    with open(args.csv) as fin:
        reader = csv.reader(fin)
        out.append(next(reader))
        n = 0
        for row in reader:
            n += 1
            if args.min_len <= float(row[1]) <= args.max_len:
                out.append(row)
    print("total %d sounds, filter remain %d sounds" % (n, len(out) - 1))

    with open(args.out, "w", newline="\n") as fout:
        csv.writer(fout).writerows(out)


if __name__ == "__main__":
    main()
