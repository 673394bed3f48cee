#!/usr/bin/env python
"""Coarse-stage rank diagnostic for the screened engine.

For every query in an extracted-embeddings dir (extractemb output),
compute the ground-truth song's RANK under the screen's stage-1 coarse
score (index/screen.py screen_core stage 1, run here with full [B,
n_songs] score output instead of the top-M cut).  The rank distribution
IS the recall-vs-screen_top_m curve: recall@M = P(rank < M) — one run
replaces a sweep of matchemb variant jobs and tells you the top_m a
target recall needs on REAL embeddings (VERDICT r3 next #1's tuning
step, done in rank space instead of answer space).

    python tools/screen_rank_diag.py <qemb_dir> <db_dir> <expected.csv> \
        [--pool-k 4] [--int8] [--batch 64]

Prints rank percentiles and recall@M for the interesting M values.
"""

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pfann_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pfann_tpu.index.align import alignment_core  # noqa: E402
from pfann_tpu.index.screen import (  # noqa: E402
    build_screen_layout,
    quantize_coarse_int8,
    quantize_queries_int8,
)
from pfann_tpu.utils import read_file_list  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("qemb_dir")
    ap.add_argument("db_dir")
    ap.add_argument("expected")
    ap.add_argument("--pool-k", type=int, default=4)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pad", type=int, default=32)
    args = ap.parse_args()

    names = read_file_list(os.path.join(args.qemb_dir, "queryList.txt"))
    idx = np.fromfile(
        os.path.join(args.qemb_dir, "query_index"), np.int64
    ).reshape(-1, 2)

    songs = [os.path.basename(s) for s in
             read_file_list(os.path.join(args.db_dir, "songList.txt"))]
    song_id = {s: i for i, s in enumerate(songs)}
    counts = np.fromfile(os.path.join(args.db_dir, "landmarkKey"), np.int32)
    d = int(json.load(open(os.path.join(args.db_dir, "index_meta.json")))
            .get("d", 128))
    emb = np.fromfile(
        os.path.join(args.qemb_dir, "query_embeddings"), np.float32
    ).reshape(-1, d)
    demb = np.fromfile(
        os.path.join(args.db_dir, "embeddings"), np.float32
    ).reshape(-1, d)

    with open(args.expected) as f:
        gt = {row["query"]: os.path.basename(row["answer"])
              for row in csv.DictReader(f)}

    k = args.pool_k
    _, coarse, R, Rc, n_pad = build_screen_layout(
        demb, counts, pad=args.pad, k=k, d=d, xla_tail=True,
    )
    if args.int8:
        coarse = quantize_coarse_int8(coarse)
    coarse_dev = jnp.asarray(coarse)
    n_songs = len(counts)

    # uniform query windows (extractemb output for fixed-length queries)
    lens = idx[:, 1]
    S = int(lens.max())
    Sc = -(-S // k)

    @jax.jit
    def stage1_rank(coarse_dev, qpad, gt_ids):
        qc = jnp.pad(qpad, ((0, 0), (0, Sc * k - S), (0, 0)))
        qc = qc.reshape(qpad.shape[0], Sc, k, -1).sum(axis=2)
        if coarse_dev.dtype == jnp.int8:
            qc = quantize_queries_int8(qc)
            dt = jnp.int32
        else:
            dt = jnp.float32
        best_c, _ = alignment_core(
            coarse_dev, qc, R=Rc, S=Sc, n_songs=n_pad,
            score_dtype=dt, impl="xla",
        )
        valid = jnp.arange(n_pad) < n_songs
        best_c = jnp.where(valid[None, :], best_c, -jnp.inf)
        gt_score = jnp.take_along_axis(best_c, gt_ids[:, None], axis=1)
        return (best_c > gt_score).sum(axis=1)

    ranks, skipped = [], 0
    batch_q, batch_g = [], []

    def run():
        nonlocal batch_q, batch_g
        if not batch_q:
            return
        qpad = np.zeros((len(batch_q), S, d), np.float32)
        for i, q in enumerate(batch_q):
            qpad[i, : q.shape[0]] = q
        r = np.asarray(stage1_rank(
            coarse_dev, jnp.asarray(qpad), jnp.asarray(batch_g)
        ))
        ranks.extend(r.tolist())
        batch_q, batch_g = [], []

    for name, (start, ln) in zip(names, idx):
        ans = gt.get(os.path.basename(name))
        if ln <= 0 or ans not in song_id:
            skipped += 1
            continue
        batch_q.append(emb[start : start + ln])
        batch_g.append(song_id[ans])
        if len(batch_q) == args.batch:
            run()
    run()

    ranks = np.asarray(ranks)
    pct = {p: int(np.percentile(ranks, p)) for p in (50, 90, 95, 99, 99.9)}
    out = {
        "n": len(ranks),
        "skipped": skipped,
        "pool_k": k,
        "int8": bool(args.int8),
        "rank_percentiles": pct,
        "recall_at_M": {
            M: round(float((ranks < M).mean()), 4)
            for M in (32, 64, 128, 256, 512, 1024, 2048)
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
