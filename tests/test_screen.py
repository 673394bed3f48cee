"""Two-stage screened retrieval (index/screen.py): the screening pass
must never change the answer — screened top-1 == exhaustive top-1, and
the surviving songs' (score, offset) are the exact alignment values."""

import numpy as np
import pytest

import jax.numpy as jnp

from pfann_tpu.index.align import AlignmentEngine, queries_to_filters
from pfann_tpu.index.screen import ScreenedAlignmentEngine


def make_db(rng, n_songs=48, min_len=12, max_len=40, d=128):
    counts = rng.integers(min_len, max_len, n_songs).astype(np.int64)
    emb = rng.standard_normal((int(counts.sum()), d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    song_pos = np.pad(np.cumsum(counts), (1, 0))
    return emb, counts, song_pos


def noisy_queries(rng, emb, counts, song_pos, n, S, noise=0.3):
    queries, want_song, want_off = [], [], []
    for _ in range(n):
        song = int(rng.integers(0, len(counts)))
        off = int(rng.integers(0, max(counts[song] - S, 1)))
        q = emb[song_pos[song] + off :][:S].copy()
        q += noise * rng.standard_normal(q.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qpad = np.zeros((S, emb.shape[1]), np.float32)
        qpad[: q.shape[0]] = q
        queries.append(qpad)
        want_song.append(song)
        want_off.append(off)
    return np.stack(queries), want_song, want_off


@pytest.mark.parametrize("k,coarse_dtype", [(4, None), (8, None),
                                            (4, "int8")])
def test_screened_matches_exhaustive_top1(k, coarse_dtype):
    """Recall guard (VERDICT r3 task #1 'done' criterion): screened
    top-1 == exhaustive top-1 on noisy queries, with exact score/offset
    agreement for every song the screen lets through.

    Regime matches production embeddings: d=128, a window count in the
    10 s-query ballpark, and noise heavy enough that the per-window true
    inner product is ~0.6 (the coarse screen's statistical margin is
    ~8 sigma here — see index/screen.py docstring; at far harsher
    settings the screen, like any prune, can drop the winner).
    k=8 is the coarser sweep point bench.py --scale exercises via
    BENCH_SCREEN_K."""
    rng = np.random.default_rng(0)
    emb, counts, song_pos = make_db(rng, min_len=16)
    full = AlignmentEngine(emb, counts, pad=16, score_dtype=jnp.float32,
                           impl="xla")
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=k, top_m=8, score_dtype=jnp.float32,
        coarse_dtype=coarse_dtype, impl="xla", backend="exact",
    )
    if coarse_dtype == "int8":
        assert scr._coarse.dtype == jnp.int8
    S = 12
    filters, want_song, want_off = noisy_queries(
        rng, emb, counts, song_pos, n=24, S=S, noise=0.12
    )
    sub_lens = np.full(len(filters), S, np.int32)
    fs, ft = full.search(filters, sub_lens)
    ss, st = scr.search(filters, sub_lens)
    for b in range(len(filters)):
        top_full = int(np.argmax(fs[b]))
        top_scr = int(np.argmax(ss[b]))
        assert top_scr == top_full == want_song[b]
        # stage-2 math is the exact alignment: same score and offset
        np.testing.assert_allclose(ss[b, top_scr], fs[b, top_full],
                                   rtol=1e-5)
        assert st[b, top_scr] == ft[b, top_full] == want_off[b]
        # every screened-in song carries the exhaustive value
        hit = ss[b] != 0
        np.testing.assert_allclose(ss[b][hit], fs[b][hit], rtol=1e-5)


def test_screened_top1_device_and_serving_contract():
    rng = np.random.default_rng(1)
    emb, counts, song_pos = make_db(rng, n_songs=32)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=4, top_m=6, score_dtype=jnp.float32,
        impl="xla", backend="exact",
    )
    S = 8
    filters, want_song, want_off = noisy_queries(
        rng, emb, counts, song_pos, n=5, S=S, noise=0.1
    )
    outs = scr.search_top1_device(filters)
    song = np.concatenate([np.asarray(o[0]) for o in outs])[: len(filters)]
    t = np.concatenate([np.asarray(o[2]) for o in outs])[: len(filters)]
    assert list(song) == want_song
    assert [int(x) for x in t] == want_off


def test_screened_small_topm_degrades_to_full():
    """top_m >= n_songs must reproduce the exhaustive table exactly for
    every song (screen is then a no-op reorder)."""
    rng = np.random.default_rng(2)
    emb, counts, song_pos = make_db(rng, n_songs=12, d=32)
    full = AlignmentEngine(emb, counts, pad=8, score_dtype=jnp.float32,
                           impl="xla")
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=8, k=4, top_m=64, score_dtype=jnp.float32,
        impl="xla", backend="exact",
    )
    assert scr.top_m == 12
    S = 4
    filters, _, _ = noisy_queries(rng, emb, counts, song_pos, n=3, S=S)
    sub_lens = np.full(len(filters), S, np.int32)
    fs, ft = full.search(filters, sub_lens)
    ss, st = scr.search(filters, sub_lens)
    np.testing.assert_allclose(ss, fs, rtol=1e-5)
    np.testing.assert_array_equal(st, ft)


@pytest.mark.parametrize("coarse_dtype", [None, "int8"])
def test_screened_coarse_pallas_interpret_parity(coarse_dtype):
    """The TPU coarse stage (pallas kernel over the pooled layout) picks
    the same survivors as the XLA coarse stage — interpret mode, tiny DB.
    int8 runs the kernel's int32-accumulate path (pallas_align.py:52)
    against the XLA int32 matmul."""
    rng = np.random.default_rng(3)
    emb, counts, song_pos = make_db(rng, n_songs=16, min_len=10,
                                    max_len=24, d=32)
    kw = dict(pad=16, k=4, top_m=4, score_dtype=jnp.float32,
              coarse_dtype=coarse_dtype, backend="exact")
    xla = ScreenedAlignmentEngine(emb, counts, impl="xla", **kw)
    pls = ScreenedAlignmentEngine(emb, counts, impl="pallas",
                                  interpret=True, **kw)
    pls.max_batch = 128  # pallas path assumes LANE-multiple batches
    S = 6
    filters, want_song, _ = noisy_queries(
        rng, emb, counts, song_pos, n=4, S=S, noise=0.2
    )
    sub_lens = np.full(len(filters), S, np.int32)
    xs, xt = xla.search(filters, sub_lens)
    ps, pt = pls.search(filters, sub_lens)
    for b in range(len(filters)):
        assert int(np.argmax(ps[b])) == int(np.argmax(xs[b])) == want_song[b]
    np.testing.assert_allclose(ps, xs, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(pt, xt)


def test_database_screen_engine(tmp_path):
    """Database wires engine='screen' (screen=True override) through the
    same query_embeddings contract as the align engine."""
    import os

    from pfann_tpu.index.database import Database, write_index_meta

    rng = np.random.default_rng(4)
    emb, counts, song_pos = make_db(rng, n_songs=10, d=32)
    db_dir = str(tmp_path)
    emb.tofile(os.path.join(db_dir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(db_dir, "landmarkKey"))
    with open(os.path.join(db_dir, "songList.txt"), "w") as f:
        f.writelines("song%d\n" % i for i in range(len(counts)))
    write_index_meta(db_dir, emb.shape[1])

    db = Database(
        db_dir,
        {"top_k": 10, "screen": True, "screen_top_m": 4,
         "db_dtype": "float32", "backend": "exact"},
        hop_size=0.5,
    )
    assert db.engine == "screen"
    # the explicit top-M selection knob must reach the screen engine
    assert db._align.backend == "exact"
    S = 6
    song = 7
    off = int(rng.integers(0, counts[song] - S))
    q = emb[song_pos[song] + off :][:S].copy()
    q += 0.1 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sco, (sid, tsec), table = db.query_embeddings(q)
    assert sid == song
    assert abs(tsec - off * 0.5) < 1e-6
    assert table.shape == (10, 2)


def test_int8_quantizers():
    """Stage-1 int8 quantization invariants: db-side symmetric range,
    zero rows stay exactly zero (the layout's leading-pad invariant
    survives quantization), and the per-query filter quantization is
    invariant to a positive per-query scale — the property that makes
    int8 ranking exact up to rounding noise."""
    from pfann_tpu.index.screen import (
        quantize_coarse_int8,
        quantize_queries_int8,
    )

    rng = np.random.default_rng(6)
    c = rng.standard_normal((64, 32)).astype(np.float32)
    c[:8] = 0.0  # leading pad rows
    q8 = quantize_coarse_int8(c.copy())
    assert q8.dtype == np.int8
    assert int(np.abs(q8).max()) == 127
    assert (q8[:8] == 0).all()
    assert q8[8:].any()

    q = rng.standard_normal((4, 6, 32)).astype(np.float32)
    a = np.asarray(quantize_queries_int8(jnp.asarray(q)))
    b = np.asarray(quantize_queries_int8(jnp.asarray(q * 37.5)))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int8


def test_screen_pool_k_must_divide_pad():
    from pfann_tpu.index.screen import screen_geometry

    with pytest.raises(ValueError, match="screen_pool_k"):
        screen_geometry(100, 10, 32, 3)


def test_per_song_best_is_zero_floored():
    """Invariant that makes Database._query_align_batch's plain
    shift-argmax safe next to the screen's pruned-row 0.0 convention:
    the alignment layout scores offsets where the query sits entirely in
    the PAD zeros (S <= pad, enforced by _use_align), so the per-song
    best — exhaustive or screened survivor — can never go below exactly
    0, even for a query anti-correlated with every song."""
    rng = np.random.default_rng(5)
    # near-identical songs (base direction + small per-row jitter) so an
    # anti-correlated query scores negative at every REAL offset
    n_songs, d = 48, 32
    counts = rng.integers(20, 32, n_songs).astype(np.int64)
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    emb = base + 0.15 * rng.standard_normal(
        (int(counts.sum()), d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    S = 8
    q = np.repeat(-base[None, :], S, axis=0)
    q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    qpad = q[None]  # [1, S, d]
    sub_lens = np.full(1, S, np.int32)

    full = AlignmentEngine(emb, counts, pad=16, score_dtype=jnp.float32,
                           impl="xla")
    fs, _ = full.search(qpad, sub_lens)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=4, top_m=4, score_dtype=jnp.float32,
        impl="xla", backend="exact",
    )
    ss, _ = scr.search(qpad, sub_lens)
    # sanity: the anti-correlated query really does score negative at
    # real offsets (the zero floor comes from the pad offsets, not from
    # a lack of negative alignments)
    sums = q @ emb.T  # window-vs-row inner products, all ~negative
    assert sums.mean() < -0.5
    # the floor: no per-song best below exactly 0, in either engine
    assert float(np.asarray(fs).min()) == 0.0
    assert float(np.asarray(ss).min()) == 0.0


def test_screen_alpha_matches_align_alpha():
    """score_alpha on the screen engine: stage 2's exact rescore applies
    the same per-window exp transform (with out-of-song masking) as the
    align engine's alpha path, so surviving songs carry identical
    values.  top_m >= n_songs makes every song survive -> full-table
    equality."""
    rng = np.random.default_rng(7)
    emb, counts, song_pos = make_db(rng, n_songs=12, d=32)
    alpha = 1.5
    full = AlignmentEngine(emb, counts, pad=8, score_dtype=jnp.float32,
                           score_alpha=alpha)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=8, k=4, top_m=64, score_dtype=jnp.float32,
        impl="xla", backend="exact", score_alpha=alpha,
    )
    S = 6
    filters, want_song, _ = noisy_queries(
        rng, emb, counts, song_pos, n=4, S=S, noise=0.1
    )
    # one ragged query: padded rows must contribute 0, not exp(-alpha)
    sub_lens = np.full(len(filters), S, np.int32)
    filters[1, 4:] = 0.0
    sub_lens[1] = 4
    fs, ft = full.search(filters, sub_lens)
    ss, st = scr.search(filters, sub_lens)
    np.testing.assert_allclose(ss, fs, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(st, ft)
    for b in range(len(filters)):
        assert int(np.argmax(ss[b])) == want_song[b]


def _capture_mp_logs():
    import logging
    import multiprocessing as mp

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = mp.get_logger()
    level = logger.level
    logger.setLevel(logging.INFO)
    return records, Capture(), logger, level


def test_screen_margin_telemetry_good_and_danger():
    """Stage-1 margin telemetry (VERDICT r3 weak #3): every search logs
    the sigma-normalized winner-vs-cut gap; the WARNING fires in the
    documented danger regime (queries whose coarse margin collapses into
    the noise floor) and stays silent for healthy queries."""
    rng = np.random.default_rng(8)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=4, top_m=4, score_dtype=jnp.float32,
        impl="xla", backend="exact",
    )
    S = 12
    sub_lens = np.full(16, S, np.int32)

    # healthy regime: true-song queries with modest noise
    good, _, _ = noisy_queries(rng, emb, counts, song_pos, n=16, S=S,
                               noise=0.12)
    records, handler, logger, level = _capture_mp_logs()
    logger.addHandler(handler)
    try:
        scr.search(good, sub_lens)
    finally:
        logger.removeHandler(handler)
        logger.setLevel(level)
    msgs = [r for r in records if "stage-1 margin" in r.getMessage()]
    assert msgs, "telemetry line missing"
    assert not any(r.levelname == "WARNING" and "danger" in r.getMessage()
                   for r in records)

    # danger regime: pure-noise queries — no true winner, margins inside
    # the coarse noise floor (the 18%-winner-drop regime's signature)
    bad = rng.standard_normal((16, S, emb.shape[1])).astype(np.float32)
    bad /= np.linalg.norm(bad, axis=2, keepdims=True)
    records2, handler2, logger, level = _capture_mp_logs()
    logger.addHandler(handler2)
    try:
        scr.search(bad, sub_lens)
    finally:
        logger.removeHandler(handler2)
        logger.setLevel(level)
    assert any(r.levelname == "WARNING" and "danger zone" in r.getMessage()
               for r in records2)


def test_screen_rescue_recovers_exhaustive():
    """Stage-3 rescue (ACCURACY_r04): in the winner-dropping regime
    (heavy noise + harsh prune) the unrescued screen returns wrong
    answers; with rescue_threshold the low-best-score queries are
    exhaustively rescored and every answer equals the align engine's.
    Clean queries stay on the screened fast path (escalation counts only
    the noisy traffic)."""
    rng = np.random.default_rng(12)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    S = 12
    clean, clean_song, clean_off = noisy_queries(
        rng, emb, counts, song_pos, n=8, S=S, noise=0.1
    )
    # noise=0.46 -> per-window true cosine ~1/sqrt(1+128*0.46^2) ~ 0.19:
    # the documented winner-drop regime (module docstring) — the
    # exhaustive 12-window sum still clears the impostor noise floor,
    # but the pooled coarse stage at top_m=1 drops winners
    noisy, noisy_song, noisy_off = noisy_queries(
        rng, emb, counts, song_pos, n=16, S=S, noise=0.46
    )
    filters = np.concatenate([clean, noisy])
    sub_lens = np.full(len(filters), S, np.int32)

    full = AlignmentEngine(emb, counts, pad=16, score_dtype=jnp.float32,
                           impl="xla")
    fs, ft = full.search(filters, sub_lens)
    want = [int(np.argmax(fs[b])) for b in range(len(filters))]
    # the exhaustive engine substantially resolves this regime (the
    # rescue contract is exhaustive-PARITY, not oracle accuracy)
    gt = clean_song + noisy_song
    assert sum(w == g for w, g in zip(want, gt)) >= len(gt) - 2

    kw = dict(pad=16, k=4, top_m=1, score_dtype=jnp.float32,
              impl="xla", backend="exact")
    bare = ScreenedAlignmentEngine(emb, counts, **kw)
    bs, _ = bare.search(filters, sub_lens)
    bare_ans = [int(np.argmax(bs[b])) for b in range(len(filters))]
    assert bare_ans != want, "regime too easy: bare screen already exact"

    scr = ScreenedAlignmentEngine(emb, counts, rescue_threshold=0.4, **kw)
    records, handler, logger, level = _capture_mp_logs()
    logger.addHandler(handler)
    try:
        ss, st = scr.search(filters, sub_lens)
    finally:
        logger.removeHandler(handler)
        logger.setLevel(level)
    # full answer/score/offset parity with the exhaustive engine
    for b in range(len(filters)):
        top = int(np.argmax(ss[b]))
        assert top == want[b]
        np.testing.assert_allclose(ss[b, top], fs[b, top], rtol=1e-5)
        assert st[b, top] == ft[b, top]
    # escalation covered the noisy queries but NOT the clean ones
    msgs = [r.getMessage() for r in records if "screen rescue" in r.getMessage()]
    assert msgs, "rescue log line missing"
    n_esc = int(msgs[0].split("/")[0].split()[-1])
    assert len(noisy) <= n_esc < len(filters)


def test_screen_rescue_alpha_parity():
    """Rescue under score_alpha: the escalated rescore must apply the
    same exp transform + masking as the align engine's alpha path, and
    the threshold maps through the monotone transform."""
    rng = np.random.default_rng(13)
    emb, counts, song_pos = make_db(rng, n_songs=12, d=32)
    alpha = 1.5
    full = AlignmentEngine(emb, counts, pad=8, score_dtype=jnp.float32,
                           score_alpha=alpha)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=8, k=4, top_m=1, score_dtype=jnp.float32,
        impl="xla", backend="exact", score_alpha=alpha,
        rescue_threshold=0.99,  # alpha-mapped cut: escalate everything
    )
    S = 6
    filters, want_song, _ = noisy_queries(
        rng, emb, counts, song_pos, n=4, S=S, noise=0.3
    )
    sub_lens = np.full(len(filters), S, np.int32)
    filters[1, 4:] = 0.0
    sub_lens[1] = 4
    fs, ft = full.search(filters, sub_lens)
    ss, st = scr.search(filters, sub_lens)
    # all escalated -> full-table equality with the exhaustive alpha path
    np.testing.assert_allclose(ss, fs, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(st, ft)


def test_database_rescue_default_plumbing(tmp_path):
    """Database serves screen_rescue=0.4 by default (the production
    contract from ACCURACY_r04) and honors 0/false as an explicit
    disable — at both the engine and config layer."""
    import os

    from pfann_tpu.index.database import Database, write_index_meta

    rng = np.random.default_rng(5)
    emb, counts, song_pos = make_db(rng, n_songs=6, d=32)
    db_dir = str(tmp_path)
    emb.tofile(os.path.join(db_dir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(db_dir, "landmarkKey"))
    with open(os.path.join(db_dir, "songList.txt"), "w") as f:
        f.writelines("song%d\n" % i for i in range(len(counts)))
    write_index_meta(db_dir, emb.shape[1])

    base = {"top_k": 5, "screen": True, "db_dtype": "float32",
            "backend": "exact"}
    db = Database(db_dir, base, hop_size=0.5)
    assert db._align._rescue_tau == 0.4
    db_off = Database(db_dir, {**base, "screen_rescue": 0}, hop_size=0.5)
    assert db_off._align._rescue_tau is None
    db_custom = Database(db_dir, {**base, "screen_rescue": 0.55},
                         hop_size=0.5)
    assert db_custom._align._rescue_tau == 0.55


def test_database_screen_auto_threshold(tmp_path):
    """screen='auto' (the default) upgrades align->screen only past the
    measured throughput crossover (~30k songs; align still wins at 20k —
    BENCH_r04_db_rescued.json), and stays exhaustive below it."""
    import os

    from pfann_tpu.index.database import Database, write_index_meta

    rng = np.random.default_rng(6)
    for n_songs, want in ((29_999, "align"), (30_000, "screen")):
        counts = np.full(n_songs, 2, dtype=np.int64)
        emb = rng.standard_normal((counts.sum(), 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        db_dir = str(tmp_path / str(n_songs))
        os.makedirs(db_dir)
        emb.tofile(os.path.join(db_dir, "embeddings"))
        counts.astype(np.int32).tofile(os.path.join(db_dir, "landmarkKey"))
        with open(os.path.join(db_dir, "songList.txt"), "w") as f:
            f.writelines("song%d\n" % i for i in range(n_songs))
        write_index_meta(db_dir, emb.shape[1])
        db = Database(
            db_dir, {"top_k": 5, "db_dtype": "float32", "backend": "exact"},
            hop_size=0.5,
        )
        assert db.engine == want, (n_songs, db.engine, want)


def test_screen_rescued_top1_matches_search():
    """VERDICT r4 #1: the SERVING fast path (search_top1) must return
    the same answers as the validated full-table path (search + rescue)
    in the winner-dropping regime — the headline-throughput engine and
    the accuracy-validated engine are the same code path now."""
    rng = np.random.default_rng(14)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    S = 12
    clean, _, _ = noisy_queries(rng, emb, counts, song_pos, n=8, S=S,
                                noise=0.1)
    noisy, _, _ = noisy_queries(rng, emb, counts, song_pos, n=16, S=S,
                                noise=0.46)
    filters = np.concatenate([clean, noisy])
    sub_lens = np.full(len(filters), S, np.int32)

    kw = dict(pad=16, k=4, top_m=1, score_dtype=jnp.float32,
              impl="xla", backend="exact")
    bare = ScreenedAlignmentEngine(emb, counts, **kw)
    b_song, _, _ = bare.search_top1(filters)

    scr = ScreenedAlignmentEngine(emb, counts, rescue_threshold=0.4, **kw)
    ss, st = scr.search(filters, sub_lens)
    song, best, t = scr.search_top1(filters)
    want = [int(np.argmax(ss[b])) for b in range(len(filters))]
    assert list(b_song) != want, "regime too easy: bare top-1 already exact"
    assert list(song) == want
    for b in range(len(filters)):
        np.testing.assert_allclose(best[b] / S, ss[b, want[b]], rtol=1e-5)
        assert t[b] == st[b, want[b]]


def test_fused_rescued_top1_matches_host_gated():
    """The fused serving path (escalation gate + whole-chunk rescue
    behind a device-side lax.cond — no host sync in the dispatch loop)
    returns exactly the host-gated stage-3 path's answers: clean rows,
    winner-dropping rows, and short sub_lens rows alike."""
    rng = np.random.default_rng(21)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    S = 12
    clean, _, _ = noisy_queries(rng, emb, counts, song_pos, n=6, S=S,
                                noise=0.1)
    noisy, _, _ = noisy_queries(rng, emb, counts, song_pos, n=15, S=S,
                                noise=0.46)
    filters = np.concatenate([clean, noisy])
    sub_lens = np.full(len(filters), S, np.int32)
    filters[3, 8:] = 0.0  # a short query zero-padded to the bucket
    sub_lens[3] = 8

    kw = dict(pad=16, k=4, top_m=1, score_dtype=jnp.float32,
              impl="xla", backend="exact", rescue_threshold=0.4)
    scr = ScreenedAlignmentEngine(emb, counts, **kw)
    assert scr._fused_ok(S), "tiny XLA config must take the fused path"
    song, best, t = scr.search_top1(filters, sub_lens)

    host = ScreenedAlignmentEngine(emb, counts, **kw)
    host._fused_ok = lambda S: False  # force the host-gated stage 3
    hsong, hbest, ht = host.search_top1(filters, sub_lens)
    assert list(song) == list(hsong)
    np.testing.assert_allclose(best, hbest, rtol=1e-5)
    np.testing.assert_array_equal(t, ht)

    # device-triple serving contract: same rescued answers, device out
    outs = scr.search_top1_device(jnp.asarray(filters))
    dsong = np.concatenate([np.asarray(o[0]) for o in outs])[: len(filters)]
    assert list(dsong[:3]) == list(song[:3])  # full-length rows agree
    assert list(dsong[4:]) == list(song[4:])


def test_fused_rescued_top1_pallas_interpret():
    """The fused cond rescue through the Pallas kernel (interpret mode):
    answers match the XLA fused path in the winner-dropping regime."""
    rng = np.random.default_rng(22)
    emb, counts, song_pos = make_db(rng, n_songs=16, min_len=10,
                                    max_len=24, d=32)
    kw = dict(pad=16, k=4, top_m=1, score_dtype=jnp.float32,
              backend="exact", rescue_threshold=0.4)
    xla = ScreenedAlignmentEngine(emb, counts, impl="xla", **kw)
    pls = ScreenedAlignmentEngine(emb, counts, impl="pallas",
                                  interpret=True, **kw)
    pls.max_batch = 128  # pallas path assumes LANE-multiple batches
    S = 6
    filters, want_song, _ = noisy_queries(
        rng, emb, counts, song_pos, n=4, S=S, noise=0.45
    )
    assert pls._fused_ok(S)
    ps, pb, pt = pls.search_top1(filters)
    xs_, xb, xt = xla.search_top1(filters)
    assert list(ps) == list(xs_)
    np.testing.assert_allclose(pb, xb, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(pt, xt)


def test_screen_rescued_top1_no_escalation_when_disabled():
    """rescue_threshold=None keeps search_top1 identical to the bare
    device fast path (no host round trips added)."""
    rng = np.random.default_rng(15)
    emb, counts, song_pos = make_db(rng, n_songs=16, d=32)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=4, top_m=4, score_dtype=jnp.float32,
        impl="xla", backend="exact",
    )
    S = 8
    filters, want_song, want_off = noisy_queries(
        rng, emb, counts, song_pos, n=5, S=S, noise=0.1
    )
    song, best, t = scr.search_top1(filters)
    assert list(song) == want_song
    assert [int(x) for x in t] == want_off


def test_database_align_pad_from_index_meta(tmp_path):
    """VERDICT r4 #6: a DB built with indexer.max_query_sec records its
    layout pad in index_meta; Database must honor it by default (long
    queries never hit the 320x topk cliff), with the explicit indexer
    knob still winning."""
    import os

    from pfann_tpu.index.database import Database, write_index_meta

    rng = np.random.default_rng(16)
    emb, counts, song_pos = make_db(rng, n_songs=6, min_len=50,
                                    max_len=70, d=32)
    db_dir = str(tmp_path)
    emb.tofile(os.path.join(db_dir, "embeddings"))
    counts.astype(np.int32).tofile(os.path.join(db_dir, "landmarkKey"))
    with open(os.path.join(db_dir, "songList.txt"), "w") as f:
        f.writelines("song%d\n" % i for i in range(len(counts)))
    write_index_meta(db_dir, emb.shape[1], meta={"align_pad": 48})

    db = Database(db_dir, {"top_k": 10, "db_dtype": "float32",
                           "backend": "exact"}, hop_size=0.5)
    assert db.align_pad == 48
    assert db._align.pad == 48
    # a 40-window query (> DEFAULT_PAD 32) stays on the fast engine
    assert db._use_align(40)
    S = 40
    song = 3
    q = emb[song_pos[song] + 2 :][:S].copy()
    q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sco, (sid, tsec), _ = db.query_embeddings(q)
    assert sid == song and abs(tsec - 1.0) < 1e-6

    # explicit indexer knob overrides the recorded value
    db2 = Database(db_dir, {"top_k": 10, "db_dtype": "float32",
                            "backend": "exact", "align_pad": 64},
                   hop_size=0.5)
    assert db2._align.pad == 64


def test_exact_int8_answers_match_f32():
    """VERDICT r4 #7: int8 exact stage — answers (song + offset) equal
    the f32 screen engine's on noisy queries, dequantized scores land
    within quantization noise, and the winner's reported score is
    f32-EXACT (host top-1-region rescore)."""
    rng = np.random.default_rng(17)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    S = 12
    filters, want_song, want_off = noisy_queries(
        rng, emb, counts, song_pos, n=12, S=S, noise=0.2
    )
    sub_lens = np.full(len(filters), S, np.int32)
    kw = dict(pad=16, k=4, top_m=8, score_dtype=jnp.float32,
              impl="xla", backend="exact", rescue_threshold=0.4)
    f32 = ScreenedAlignmentEngine(emb, counts, **kw)
    q8 = ScreenedAlignmentEngine(emb, counts, exact_dtype="int8", **kw)
    assert q8._db3.dtype == jnp.int8

    fs, ft = f32.search(filters, sub_lens)
    qs, qt = q8.search(filters, sub_lens)
    for b in range(len(filters)):
        w = int(np.argmax(fs[b]))
        assert int(np.argmax(qs[b])) == w == want_song[b]
        assert qt[b, w] == ft[b, w]
        # winner score is f32-exact (rescored from the host matrix)
        np.testing.assert_allclose(qs[b, w], fs[b, w], rtol=1e-5)
    # non-winner survivors: dequantized-approximate (within quant noise)
    both = (fs != 0) & (qs != 0)
    np.testing.assert_allclose(qs[both], fs[both], atol=0.03)

    # top-1 serving path: same answers, f32-exact winner score
    song, best, t = q8.search_top1(filters)
    fsong, fbest, ftop = f32.search_top1(filters)
    assert list(song) == list(fsong) == want_song
    np.testing.assert_array_equal(t, ftop)
    np.testing.assert_allclose(best, fbest, rtol=1e-5)


def test_exact_int8_rescue_winner_drop_regime():
    """int8 exact stage + stage-3 rescue: in the winner-dropping regime
    the int8 rescue (int8 full-layout rescore) must recover the same
    answers as the f32 rescued engine."""
    rng = np.random.default_rng(18)
    emb, counts, song_pos = make_db(rng, n_songs=48, min_len=16)
    S = 12
    noisy, _, _ = noisy_queries(rng, emb, counts, song_pos, n=12, S=S,
                                noise=0.46)
    sub_lens = np.full(len(noisy), S, np.int32)
    kw = dict(pad=16, k=4, top_m=1, score_dtype=jnp.float32,
              impl="xla", backend="exact", rescue_threshold=0.4)
    f32 = ScreenedAlignmentEngine(emb, counts, **kw)
    q8 = ScreenedAlignmentEngine(emb, counts, exact_dtype="int8", **kw)
    fs, ft = f32.search(noisy, sub_lens)
    qs, qt = q8.search(noisy, sub_lens)
    for b in range(len(noisy)):
        w = int(np.argmax(fs[b]))
        assert int(np.argmax(qs[b])) == w
        assert qt[b, w] == ft[b, w]


def test_exact_int8_rejects_alpha():
    rng = np.random.default_rng(19)
    emb, counts, _ = make_db(rng, n_songs=8, d=32)
    with pytest.raises(ValueError, match="screen_exact_dtype"):
        ScreenedAlignmentEngine(emb, counts, pad=16, exact_dtype="int8",
                                score_alpha=1.0, impl="xla")


def test_rescue_chunk_caps_pallas_long_queries():
    """The 4 GiB XLA score-tensor cap must also fire on a
    Pallas-configured engine when S exceeds the fused kernel's halo:
    alignment_core silently falls back to XLA there, and an uncapped
    128-wide 60 s rescue is a ~316 GB [N, S, B] tensor (measured OOM
    on the r5 eval DB)."""
    from pfann_tpu.index.pallas_align import HALO

    rng = np.random.default_rng(5)
    emb, counts, song_pos = make_db(rng, min_len=16)
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=16, k=4, top_m=8, score_dtype=jnp.bfloat16,
        impl="xla", backend="exact",
    )
    # pretend the engine rides the fused kernel (impl only gates the
    # chunk policy here; no dispatch happens)
    scr.impl = "pallas"
    assert scr._rescue_chunk(S=19) == scr.RESCUE_CHUNK
    long_s = HALO + 88  # 60 s = 119 windows
    cap = (4 << 30) // (scr.n_pad * scr.R * long_s * 2)
    assert scr._rescue_chunk(S=long_s) == max(1, min(scr.RESCUE_CHUNK, cap))
