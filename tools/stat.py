#!/usr/bin/env python
"""Aggregate per-stage timings from a pfann_tpu log file — the de-facto
profiler report (parity: reference tools/stat.py; log lines come from the
same '<task> N.NNNNNNs' convention in musicdata/matcher/database)."""

import argparse
import re
from collections import Counter

TASKS = [
    "load", "resample", "stereo to mono", "compute embedding",
    "search", "rerank", "output answer", "total query time",
]


def aggregate(path: str) -> Counter:
    totals = Counter()
    pattern = re.compile(r"(%s) (\d+\.\d+)s" % "|".join(TASKS))
    with open(path, encoding="utf8") as fin:
        for line in fin:
            split = line.rfind("] ")
            body = line if split == -1 else line[split + 2 :]
            m = pattern.search(body)
            if m:
                totals[m.group(1)] += float(m.group(2))
    return totals


if __name__ == "__main__":
    args = argparse.ArgumentParser()
    args.add_argument("log")
    args = args.parse_args()
    for task, secs in aggregate(args.log).items():
        print("%s %.3f s" % (task, secs))
