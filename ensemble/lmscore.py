#!/usr/bin/env python
"""Extract (landmark score, is_correct) pairs from a landmark-system run.

Parity: reference ensemble/lmscore.py — the landmark matcher's .bin is
[n_query, n_songs, 2] int32 and the *second* column holds the score.

    python ensemble/lmscore.py <songlist> <gt> <predict> <out.npy>
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import _base, extract_ans, read_song_ids, song_row  # noqa: E402


def main():
    args = argparse.ArgumentParser()
    args.add_argument("songlist")
    args.add_argument("groundtruth")
    args.add_argument("predict")
    args.add_argument("out")
    args = args.parse_args()

    gt = dict(extract_ans(args.groundtruth))
    pr = extract_ans(args.predict, raw_answers=True)
    song_ids, n_songs = read_song_ids(args.songlist)

    sco_bin = np.fromfile(args.predict + ".bin", dtype=np.int32)
    sco_bin = sco_bin.reshape([-1, n_songs, 2])

    scores = []
    for i, (query, ans) in enumerate(pr):
        if query not in gt:
            print("query %s in prediction file not found!!" % query)
            raise SystemExit(1)
        row = song_row(song_ids, ans)
        if row is not None:
            scores.append((sco_bin[i, row, 1], _base(ans) == gt[query]))
        else:  # matcher "error" row (undecodable / unmatchable query)
            scores.append((0.0, False))
    np.save(args.out, np.array(scores, dtype=np.float32))


if __name__ == "__main__":
    main()
