"""Shared helpers for the ensemble pipeline (thesis landmark+NN fusion).

Parity: the extract_ans txt/csv readers duplicated across reference
ensemble/extractscore.py / lmscore.py / mirexacc.py.
"""

from __future__ import annotations

import csv
import os


def _base(p: str) -> str:
    return os.path.splitext(os.path.split(p)[1])[0]


def extract_ans(path: str, raw_answers: bool = False
                ) -> list[tuple[str, str]]:
    """(query, answer) pairs from a TSV or matcher detail CSV.  Queries
    are always basenames (the ground-truth key); answers are basenames
    unless ``raw_answers`` keeps the matcher's full path — needed to
    index merged-DB song lists whose BASENAMES collide across shard
    corpora (every make_synth_corpus root shares the s%04d.wav
    namespace)."""
    out: list[tuple[str, str]] = []
    if path.endswith(".csv"):
        with open(path, "r") as fin:
            reader = csv.reader(fin)
            next(reader)
            for line in reader:
                out.append((_base(line[0]),
                            line[1] if raw_answers else _base(line[1])))
    else:
        with open(path, "r") as fin:
            for line in fin:
                query, ans = line.rstrip("\n").split("\t")
                out.append((_base(query),
                            ans if raw_answers else _base(ans)))
    return out


def read_song_ids(songlist: str) -> tuple[dict[str, int], int]:
    """(ids, n_songs).  ids maps BOTH the verbatim songList line (the
    matcher answers' full path) and its basename to the row index;
    basename keys keep the FIRST occurrence (reference convention) —
    full-path keys are exact even when merged shards collide on
    basenames.  n_songs is the true line count (len(ids) undercounts
    under collisions; the .bin reshape must use this)."""
    ids: dict[str, int] = {}
    n = 0
    with open(songlist) as fin:
        for i, line in enumerate(fin):
            name = line.rstrip("\n")
            ids[name] = i
            ids.setdefault(_base(name), i)
            n = i + 1
    return ids, n


def song_row(song_ids: dict[str, int], ans: str) -> int | None:
    """Row index of a predicted answer: full path first, basename
    fallback (legacy single-corpus lists)."""
    hit = song_ids.get(ans)
    if hit is None:
        hit = song_ids.get(_base(ans))
    return hit
