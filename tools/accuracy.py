#!/usr/bin/env python
"""Evaluate matcher output against ground truth.

Parity target: reference tools/accuracy.py — compares basenames;
*song* = correct track, *near* = correct and |dt| <= 0.5 s,
*exact* = correct and |dt| <= 0.25 s.

    python tools/accuracy.py <expected.csv> <result_detail.csv>
"""

import argparse
import csv
import os


def evaluate(groundtruth: str, predict: str) -> dict:
    with open(groundtruth, "r") as fin:
        gt = {os.path.basename(row["query"]): row for row in csv.DictReader(fin)}

    total = correct = correct_near = correct_exact = 0
    with open(predict, "r") as fin:
        for row in csv.DictReader(fin):
            name = os.path.basename(row["query"])
            ans = os.path.basename(row["answer"])
            actual = gt[name]
            total += 1
            if os.path.basename(actual["answer"]) != ans:
                continue
            correct += 1
            dt = abs(float(actual["time"]) - float(row["time"]))
            if dt <= 0.25:
                correct_exact += 1
            if dt <= 0.5:
                correct_near += 1
    return {
        "total": total,
        "song": correct,
        "near": correct_near,
        "exact": correct_exact,
        "song_acc": correct / total * 100 if total else 0.0,
        "near_acc": correct_near / total * 100 if total else 0.0,
        "exact_acc": correct_exact / total * 100 if total else 0.0,
    }


def main() -> None:
    args = argparse.ArgumentParser()
    args.add_argument("groundtruth")
    args.add_argument("predict")
    args = args.parse_args()
    r = evaluate(args.groundtruth, args.predict)
    print("exact match correct %d acc %.2f" % (r["exact"], r["exact_acc"]))
    print("near match correct %d acc %.2f" % (r["near"], r["near_acc"]))
    print("song correct %d acc %.2f" % (r["song"], r["song_acc"]))


if __name__ == "__main__":
    main()
