#!/usr/bin/env python
"""Headline benchmark: retrieval throughput on the real TPU chip.

Scenario (BASELINE.md target): 10 s queries against a 10k-track database
(~1.2M x 128 embeddings), search + sequence rerank — the part the
reference spends its time in (faiss IVF-PQ search + the Python/C++ rerank,
database.py:117-166).  Target: >= 5000 queries/s/chip.

Prints ONE JSON line:
    {"metric": "queries_per_sec", "value": N, "unit": "10s-queries/s/chip",
     "vs_baseline": N / 5000}
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pfann_tpu.parallel.mesh import make_mesh
    from pfann_tpu.parallel.sharded_search import ShardedDatabase

    rng = np.random.default_rng(0)
    n_songs = 10_000
    segs_per_song = 120  # ~60 s tracks at 0.5 s hop
    d = 128
    counts = np.full(n_songs, segs_per_song, dtype=np.int64)
    n_total = int(counts.sum())

    emb = rng.standard_normal((n_total, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    mesh = make_mesh("db", 1)
    db = ShardedDatabase(
        emb, counts, mesh, top_k=100,
        backend="approx" if jax.default_backend() == "tpu" else "exact",
        db_dtype=jnp.bfloat16,
    )

    # 10 s queries = 19 segments (matcher.py:109-110)
    qlen, batch = 19, 64
    queries, sources = [], []
    for i in range(batch):
        song = int(rng.integers(0, n_songs))
        off = int(rng.integers(0, segs_per_song - qlen))
        q = emb[song * segs_per_song + off :][:qlen].copy()
        q += 0.1 * rng.standard_normal(q.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        queries.append(q)
        sources.append(song)

    # warmup / compile + recall sanity: every noisy query must resolve to
    # its source song (random 128-d embeddings are far apart)
    smax, _ = db.query_batch(queries, pad_to=24)
    hits = sum(int(np.argmax(smax[i])) == sources[i] for i in range(batch))
    assert hits == batch, "recall sanity failed: %d/%d" % (hits, batch)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        db.query_batch(queries, pad_to=24)
    dt = time.time() - t0
    qps = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "queries_per_sec",
                "value": round(qps, 1),
                "unit": "10s-queries/s/chip",
                "vs_baseline": round(qps / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
