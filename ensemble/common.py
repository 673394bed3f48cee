"""Shared helpers for the ensemble pipeline (thesis landmark+NN fusion).

Parity: the extract_ans txt/csv readers duplicated across reference
ensemble/extractscore.py / lmscore.py / mirexacc.py.
"""

from __future__ import annotations

import csv
import os


def _base(p: str) -> str:
    return os.path.splitext(os.path.split(p)[1])[0]


def extract_ans(path: str) -> list[tuple[str, str]]:
    """(query, answer) basename pairs from a TSV or matcher detail CSV."""
    out: list[tuple[str, str]] = []
    if path.endswith(".csv"):
        with open(path, "r") as fin:
            reader = csv.reader(fin)
            next(reader)
            for line in reader:
                out.append((_base(line[0]), _base(line[1])))
    else:
        with open(path, "r") as fin:
            for line in fin:
                query, ans = line.rstrip("\n").split("\t")
                out.append((_base(query), _base(ans)))
    return out


def read_song_ids(songlist: str) -> dict[str, int]:
    ids: dict[str, int] = {}
    with open(songlist) as fin:
        for i, line in enumerate(fin):
            ids[_base(line.rstrip("\n"))] = i
    return ids
