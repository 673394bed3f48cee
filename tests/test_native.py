"""Native CPU core (native/seqscore.cpp) parity vs the JAX topk engine,
and the standalone matcher binary's wire protocol."""

import os
import struct
import subprocess

import numpy as np
import pytest

from pfann_tpu.index.native import build, load, native_query

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_db(rng, n_songs=8, min_len=6, max_len=30, d=16):
    counts = rng.integers(min_len, max_len, n_songs)
    song_pos = np.pad(np.cumsum(counts.astype(np.int64)), (1, 0))
    db = rng.standard_normal((song_pos[-1], d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    return db, counts, song_pos


@pytest.fixture(scope="module")
def native_lib():
    lib = load()
    if lib is None:
        pytest.skip("native core could not be built")
    return lib


def test_native_matches_jax_topk_engine(native_lib):
    import jax.numpy as jnp

    from pfann_tpu.index.search import finalize_song_scores, search_and_rerank

    rng = np.random.default_rng(0)
    db, counts, song_pos = make_db(rng)
    query = db[song_pos[3] + 1 : song_pos[3] + 8].copy()
    query += 0.05 * rng.standard_normal(query.shape).astype(np.float32)
    query /= np.linalg.norm(query, axis=1, keepdims=True)

    best, song_scores = native_query(db, song_pos, query, top_k=5)

    smax, stime = search_and_rerank(
        jnp.asarray(db), jnp.asarray(song_pos, jnp.int32), jnp.asarray(query),
        jnp.ones(query.shape[0], bool), top_k=5, n_songs=len(counts),
        backend="exact",
    )
    _, (jax_best, _), jax_table = finalize_song_scores(
        np.asarray(smax), np.asarray(stime), 1.0, 1
    )
    assert best == jax_best == 3
    np.testing.assert_allclose(song_scores[:, 0], jax_table[:, 0], rtol=1e-4, atol=1e-5)
    rec = jax_table[:, 0] > 0
    np.testing.assert_allclose(song_scores[rec, 1], jax_table[rec, 1], atol=1e-5)


def test_native_alpha_scoring(native_lib):
    rng = np.random.default_rng(1)
    db, counts, song_pos = make_db(rng)
    query = db[song_pos[2] : song_pos[2] + 6].copy()
    best_a, scores_a = native_query(db, song_pos, query, top_k=5, score_alpha=4.0)
    best_0, scores_0 = native_query(db, song_pos, query, top_k=5)
    assert best_a == best_0 == 2
    # exact match: ip=1 -> exp(0)=1 for every in-range row
    assert scores_a[2, 0] == pytest.approx(1.0, abs=1e-4)


def test_matcher_binary_protocol(native_lib, tmp_path):
    rng = np.random.default_rng(2)
    db, counts, song_pos = make_db(rng, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))

    binary = os.path.join(REPO, "native", "matcher")
    proc = subprocess.Popen(
        [binary, dbdir, "5", "1", "0"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    answers = []
    for song in (1, 4, 6):
        q = db[song_pos[song] : song_pos[song] + 5].astype(np.float32)
        proc.stdin.write(struct.pack("<I", q.shape[0]))
        proc.stdin.write(q.tobytes())
        proc.stdin.flush()
        answers.append(struct.unpack("<i", proc.stdout.read(4))[0])
    proc.stdin.close()
    proc.wait(timeout=30)
    assert answers == [1, 4, 6]
