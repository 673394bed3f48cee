"""Exhaustive-alignment engine tests vs naive numpy full alignment
(the reference oracle semantics, matchfromgt.py:127-147)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pfann_tpu.index.align import (
    AlignmentEngine,
    build_uniform_layout,
    queries_to_filters,
)
from pfann_tpu.index.database import Database, write_index_meta
from pfann_tpu.index.search import finalize_song_scores


def make_db(rng, n_songs=7, min_len=5, max_len=40, d=16):
    counts = rng.integers(min_len, max_len, n_songs)
    song_pos = np.pad(np.cumsum(counts.astype(np.int64)), (1, 0))
    db = rng.standard_normal((song_pos[-1], d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    return db, counts, song_pos


def naive_full_alignment(db, song_pos, subquery, sub_len):
    """Best mean-IP alignment per song over ALL offsets t in [-S+1, len)."""
    n_songs = len(song_pos) - 1
    S = sub_len
    best = np.full(n_songs, -np.inf)
    best_t = np.zeros(n_songs)
    for song in range(n_songs):
        start, length = song_pos[song], song_pos[song + 1] - song_pos[song]
        for t in range(-(S - 1), length):
            sco = 0.0
            for i in range(S):
                if 0 <= t + i < length:
                    sco += float(db[start + t + i] @ subquery[i])
            sco /= S
            if sco > best[song]:
                best[song] = sco
                best_t[song] = t
    return best, best_t


def test_padded_layout():
    rng = np.random.default_rng(0)
    db, counts, song_pos = make_db(rng, n_songs=3)
    padded, R = build_uniform_layout(db, counts, pad=8)
    assert R == 8 + int(counts.max())
    assert padded.shape[0] == 3 * R + 8
    # song rows preserved; pads and slack are zero
    for s in range(3):
        np.testing.assert_array_equal(
            padded[s * R + 8 : s * R + 8 + counts[s]],
            db[song_pos[s] : song_pos[s + 1]],
        )
        assert (padded[s * R : s * R + 8] == 0).all()
        assert (padded[s * R + 8 + counts[s] : (s + 1) * R] == 0).all()


@pytest.mark.parametrize("fsm", [1, 2])
def test_matches_naive_full_alignment(fsm):
    rng = np.random.default_rng(1)
    db, counts, song_pos = make_db(rng)
    engine = AlignmentEngine(db, counts, pad=16, score_dtype=jnp.float32)
    qlen = 6 * fsm
    query = db[song_pos[2] + 3 : song_pos[2] + 3 + qlen].copy()
    query += 0.05 * rng.standard_normal(query.shape).astype(np.float32)

    filters, sub_lens, _ = queries_to_filters(query, fsm, engine.max_query_windows())
    score, t = engine.search(filters, sub_lens)

    for shift in range(fsm):
        ref_best, ref_t = naive_full_alignment(
            db, song_pos, query[shift::fsm], int(sub_lens[shift])
        )
        # uniform regions include all-zero windows past the song end, so
        # the engine's per-song best is clamped at 0 (matching the
        # reference song_score table's 0-floor, database.py:125)
        np.testing.assert_allclose(
            score[shift], np.maximum(ref_best, 0.0), rtol=1e-4, atol=1e-5
        )
        pos = ref_best > 1e-6
        np.testing.assert_allclose(t[shift][pos], ref_t[pos], atol=0)


def test_align_engine_beats_or_equals_topk(tmp_path):
    """Exhaustive alignment scores >= candidate-restricted topk scores."""
    rng = np.random.default_rng(2)
    db, counts, song_pos = make_db(rng, n_songs=10, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("song%d\n" % i for i in range(10)))
    write_index_meta(dbdir, d=8)

    query = db[song_pos[4] + 2 : song_pos[4] + 9] + 0.1 * rng.standard_normal(
        (7, 8)
    ).astype(np.float32)

    albase = {"top_k": 4, "backend": "exact", "db_dtype": "float32"}
    d_align = Database(dbdir, dict(albase, engine="align"), hop_size=0.5)
    d_topk = Database(dbdir, dict(albase, engine="topk"), hop_size=0.5)
    ba, (sa, ta), tab_a = d_align.query_embeddings(query)
    bt, (st, tt), tab_t = d_topk.query_embeddings(query)
    assert sa == st == 4
    assert ta == pytest.approx(tt)
    assert ba >= bt - 1e-5
    has = tab_t[:, 0] > 0
    assert (tab_a[has, 0] >= tab_t[has, 0] - 1e-5).all()


def test_align_negative_offset():
    """Query starting before the song start (t < 0) is representable."""
    rng = np.random.default_rng(3)
    db, counts, song_pos = make_db(rng, n_songs=4, min_len=12)
    engine = AlignmentEngine(db, counts, pad=16, score_dtype=jnp.float32)
    # query = 3 zero rows then the first 4 segments of song 1 => t = -3
    query = np.concatenate(
        [np.zeros((3, 16), np.float32), db[song_pos[1] : song_pos[1] + 4]]
    )
    filters, sub_lens, _ = queries_to_filters(query, 1, 16)
    score, t = engine.search(filters, sub_lens)
    assert int(np.argmax(score[0])) == 1
    assert t[0, 1] == -3


def test_align_database_batch_matches_single(tmp_path):
    rng = np.random.default_rng(4)
    db, counts, song_pos = make_db(rng, n_songs=6, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("s%d\n" % i for i in range(6)))
    write_index_meta(dbdir, d=8)
    database = Database(
        dbdir, {"top_k": 4, "engine": "align", "db_dtype": "float32"}, hop_size=0.5
    )
    q1 = db[song_pos[1] + 1 : song_pos[1] + 7]
    q2 = db[song_pos[5] : song_pos[5] + 5]
    single = [database.query_embeddings(q) for q in (q1, q2)]
    batch = database.query_embeddings_batch([q1, q2])
    for s, b in zip(single, batch):
        assert s[1][0] == b[1][0]
        np.testing.assert_allclose(s[0], b[0], rtol=1e-5)
        np.testing.assert_allclose(s[2], b[2], rtol=1e-5, atol=1e-6)


def test_align_engine_fsm2_database(tmp_path):
    """Database-level frame_shift_mul=2: align and topk engines agree on
    the answer and on recorded song scores."""
    rng = np.random.default_rng(7)
    db, counts, song_pos = make_db(rng, n_songs=8, min_len=10, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("s%d\n" % i for i in range(8)))
    write_index_meta(dbdir, d=8)

    # interleaved sub-hop query: rows alternate between two shifted
    # sequences of song 5
    base = db[song_pos[5] + 2 : song_pos[5] + 8]
    query = np.repeat(base, 2, axis=0)
    # perturb the odd rows (shift 1) so shift 0 wins uniquely — an exact
    # repeat ties both shifts at score 1.0 and tie-breaks differ
    query[1::2] += 0.1 * rng.standard_normal(query[1::2].shape).astype(np.float32)
    common = {"top_k": 8, "backend": "exact", "db_dtype": "float32",
              "frame_shift_mul": 2}
    d_align = Database(dbdir, dict(common, engine="align"), hop_size=0.5)
    d_topk = Database(dbdir, dict(common, engine="topk"), hop_size=0.5)
    ba, (sa, ta), tab_a = d_align.query_embeddings(query)
    bt, (st, tt), tab_t = d_topk.query_embeddings(query)
    assert sa == st == 5
    assert ta == pytest.approx(tt)
    np.testing.assert_allclose(ba, bt, rtol=1e-4)


def test_top1_device_matches_host_finalize():
    rng = np.random.default_rng(8)
    db, counts, song_pos = make_db(rng, n_songs=9)
    engine = AlignmentEngine(db, counts, pad=16, score_dtype=jnp.float32)
    filters = np.zeros((3, 5, 16), np.float32)
    for i, song in enumerate((2, 6, 8)):
        filters[i] = db[song_pos[song] + 1 : song_pos[song] + 6]
    (out,) = engine.search_top1_device(filters)
    song, sco_sum, t = (np.asarray(o) for o in out)
    score, t_host = engine.search(filters, np.full(3, 5, np.int32))
    for i, s in enumerate((2, 6, 8)):
        assert song[i] == s == int(np.argmax(score[i]))
        np.testing.assert_allclose(sco_sum[i] / 5, score[i, s], rtol=1e-5)
        assert t[i] == t_host[i, s] == 1


def test_zero_length_song_in_db(tmp_path):
    """Builder records 0 segments for broken files (builder.py:82-86);
    the align engine must keep song indexing consistent around them."""
    rng = np.random.default_rng(9)
    counts = np.asarray([10, 0, 14, 0, 8])
    total = int(counts.sum())
    db = rng.standard_normal((total, 8)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    song_pos = np.pad(np.cumsum(counts), (1, 0))

    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("s%d\n" % i for i in range(5)))
    write_index_meta(dbdir, d=8)

    database = Database(
        dbdir, {"top_k": 5, "engine": "align", "db_dtype": "float32"},
        hop_size=0.5,
    )
    for song in (0, 2, 4):
        q = db[song_pos[song] + 1 : song_pos[song] + 6]
        best, (ans, tim), table = database.query_embeddings(q)
        assert ans == song
        assert tim == pytest.approx(0.5)
        # zero-length songs can never score above the empty-window floor
        assert table[1, 0] <= 1e-6 and table[3, 0] <= 1e-6


def test_lowered_max_batch_chunking_invariance():
    """bench.py --batch-sweep lowers engine.max_batch to dispatch
    genuinely smaller kernel batches; chunk size must not change any
    result (zero-pad tail chunks score zero rows as zeros)."""
    rng = np.random.default_rng(9)
    db, counts, song_pos = make_db(rng, n_songs=9)
    engine = AlignmentEngine(db, counts, pad=16, score_dtype=jnp.float32)
    filters = rng.standard_normal((12, 5, db.shape[1])).astype(np.float32)
    for i in range(12):
        song = i % 9
        filters[i, :4] = db[song_pos[song] : song_pos[song] + 4]
    sub_lens = np.full(12, 5, np.int32)
    want_s, want_t = engine.search(filters, sub_lens)
    orig = engine.max_batch
    try:
        engine.max_batch = 4
        got_s, got_t = engine.search(filters, sub_lens)
    finally:
        engine.max_batch = orig
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    np.testing.assert_array_equal(got_t, want_t)


def naive_alpha_alignment(db, song_pos, subquery, sub_len, alpha):
    """Reference alpha scoring (seqscore.cpp:103-110): per-window
    contribution exp(-alpha (1 - ip)^2), out-of-range windows contribute
    0 (seqscore.cpp:96-101), mean over my_len = sub_len."""
    n_songs = len(song_pos) - 1
    S = sub_len
    best = np.full(n_songs, -np.inf)
    best_t = np.zeros(n_songs)
    for song in range(n_songs):
        start, length = song_pos[song], song_pos[song + 1] - song_pos[song]
        for t in range(-(S - 1), length):
            sco = 0.0
            for i in range(S):
                if 0 <= t + i < length:
                    ip = float(db[start + t + i] @ subquery[i])
                    sco += float(np.exp(-alpha * (1.0 - ip) ** 2))
            sco /= S
            if sco > best[song]:
                best[song] = sco
                best_t[song] = t
    return best, best_t


@pytest.mark.parametrize("fsm", [1, 2])
def test_alpha_matches_naive(fsm):
    """score_alpha on the align engine: elementwise transform before the
    diagonal sum, with out-of-song windows and padded query rows masked
    to 0, matches the reference alpha semantics at every (song, offset)."""
    rng = np.random.default_rng(11)
    db, counts, song_pos = make_db(rng)
    alpha = 2.0
    engine = AlignmentEngine(
        db, counts, pad=16, score_dtype=jnp.float32, score_alpha=alpha
    )
    assert engine.impl == "xla"
    qlen = 5 * fsm + 1  # ragged on purpose: shifts get unequal sub_lens
    query = db[song_pos[3] + 2 : song_pos[3] + 2 + qlen].copy()
    query += 0.05 * rng.standard_normal(query.shape).astype(np.float32)

    filters, sub_lens, _ = queries_to_filters(
        query, fsm, engine.max_query_windows()
    )
    score, t = engine.search(filters, sub_lens)

    for shift in range(fsm):
        ref_best, ref_t = naive_alpha_alignment(
            db, song_pos, query[shift::fsm], int(sub_lens[shift]), alpha
        )
        np.testing.assert_allclose(
            score[shift], np.maximum(ref_best, 0.0), rtol=1e-4, atol=1e-5
        )
        pos = ref_best > 1e-6
        np.testing.assert_allclose(t[shift][pos], ref_t[pos], atol=0)


def test_alpha_database_align_vs_topk(tmp_path):
    """Database-level alpha: the align engine no longer falls back to
    topk for score_alpha != 0 (VERDICT r3 next #4) and agrees with the
    topk engine on the answer; exhaustive scores >= candidate-restricted
    ones."""
    rng = np.random.default_rng(12)
    db, counts, song_pos = make_db(rng, n_songs=10, min_len=10, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("s%d\n" % i for i in range(10)))
    write_index_meta(dbdir, d=8)

    query = db[song_pos[6] + 1 : song_pos[6] + 8] + 0.1 * rng.standard_normal(
        (7, 8)
    ).astype(np.float32)
    query /= np.linalg.norm(query, axis=1, keepdims=True)

    common = {"top_k": 8, "backend": "exact", "db_dtype": "float32",
              "score_alpha": 1.5}
    d_align = Database(dbdir, dict(common, engine="align"), hop_size=0.5)
    d_topk = Database(dbdir, dict(common, engine="topk"), hop_size=0.5)
    assert d_align.engine == "align"  # not silently demoted to topk
    ba, (sa, ta), tab_a = d_align.query_embeddings(query)
    bt, (st, tt), tab_t = d_topk.query_embeddings(query)
    assert sa == st == 6
    assert ta == pytest.approx(tt)
    # the true alignment was in the candidate set -> same best score
    np.testing.assert_allclose(ba, bt, rtol=1e-4)
    has = tab_t[:, 0] > 0
    assert (tab_a[has, 0] >= tab_t[has, 0] - 1e-5).all()


def test_align_pad_serves_long_queries(tmp_path):
    """indexer align_pad keeps queries longer than the default 32-window
    layout pad on the fast engine (the 60 s MIREX shape); without it the
    Database logs the fallback and serves via topk."""
    import logging
    import multiprocessing as mp

    rng = np.random.default_rng(13)
    db, counts, song_pos = make_db(rng, n_songs=6, min_len=52, max_len=60, d=8)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("s%d\n" % i for i in range(6)))
    write_index_meta(dbdir, d=8)

    qlen = 48  # > DEFAULT_PAD=32 windows
    query = db[song_pos[2] + 1 : song_pos[2] + 1 + qlen].copy()
    query += 0.05 * rng.standard_normal(query.shape).astype(np.float32)
    query /= np.linalg.norm(query, axis=1, keepdims=True)

    base = {"top_k": 6, "backend": "exact", "db_dtype": "float32",
            "engine": "align"}
    wide = Database(dbdir, dict(base, align_pad=64), hop_size=0.5)
    assert wide._use_align(qlen)
    bw, (sw, tw), _ = wide.query_embeddings(query)
    assert (sw, tw) == (2, 0.5)

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    narrow = Database(dbdir, dict(base), hop_size=0.5)
    handler = Capture()
    mp.get_logger().addHandler(handler)
    try:
        assert not narrow._use_align(qlen)  # falls back...
        bn, (sn, tn), _ = narrow.query_embeddings(query)
    finally:
        mp.get_logger().removeHandler(handler)
    assert (sn, tn) == (2, 0.5)  # ...but still answers correctly
    assert any("topk fallback" in r.getMessage() for r in records)
    np.testing.assert_allclose(bw, bn, rtol=1e-4)
