#!/usr/bin/env python
"""MIREX-style accuracy + score-threshold analysis.

Parity: reference tools/mirexacc.py — accepts TSV (query\tanswer) or the
matcher detail CSV; compares basenames; prints song accuracy and, when
mixed, the score threshold that would separate correct from incorrect
answers with its TP/FN counts.
"""

import argparse
import csv
import os


def _base(p):
    return os.path.splitext(os.path.split(p)[1])[0]


def extract_ans(path):
    out = {}
    if path.endswith(".csv"):
        with open(path, "r") as fin:
            reader = csv.reader(fin)
            next(reader)
            for line in reader:
                q = _base(line[0])
                if q in out:
                    print("Warning! query %s occured twice" % line[0])
                out[q] = (_base(line[1]), float(line[2]))
    else:
        with open(path, "r") as fin:
            for line in fin:
                query, ans = line.rstrip("\n").split("\t")
                q = _base(query)
                if q in out:
                    print("Warning! query %s occured twice" % query)
                out[q] = (_base(ans), 0.0)
    return out


def main():
    args = argparse.ArgumentParser()
    args.add_argument("groundtruth")
    args.add_argument("predict")
    args = args.parse_args()

    gt = extract_ans(args.groundtruth)
    pr = extract_ans(args.predict)

    scores, correct, total = [], 0, 0
    for query, (ans, sco) in pr.items():
        if query not in gt:
            print("query %s in prediction file not found!!" % query)
            raise SystemExit(1)
        total += 1
        ok = ans == gt[query][0]
        correct += ok
        scores.append((sco, ok))
    print("song correct %d acc %.2f" % (correct, correct / total * 100))
    scores.sort()
    if correct == 0:
        print("totally wrong")
    elif correct == total:
        print("all correct")
    else:
        thres = (scores[total - correct - 1][0] + scores[total - correct][0]) / 2
        fn = sum(ok for sco, ok in scores if sco <= thres)
        print("threshold %f TP %d FN %d" % (thres, correct - fn, fn))


if __name__ == "__main__":
    main()
