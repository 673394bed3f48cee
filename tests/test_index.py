"""Retrieval engine tests: MIPS top-k + sequence rerank vs a literal numpy
transcription of the reference semantics (database.py:117-166,
seqscore.cpp:32-136)."""

import json
import os

import numpy as np
import pytest

from pfann_tpu.index.database import Database, write_index_meta
from pfann_tpu.index.search import (
    finalize_song_scores,
    mips_topk,
    seq_rerank,
    search_and_rerank,
)


def naive_query(db, song_pos, query, top_k, hop_size, fsm=1, score_alpha=0.0):
    """Literal numpy re-statement of database.py:117-163 (python rerank,
    extended with seqscore.cpp:103-110 alpha scoring)."""
    scores = query @ db.T
    labels = np.argsort(-scores, axis=1)[:, :top_k]
    n_songs = len(song_pos) - 1
    best, best_song_t = -np.inf, (-1, 0.0)
    song_score = np.zeros([n_songs, 2], dtype=np.float32)
    for shift in range(fsm):
        candidates = []
        subquery = query[shift::fsm]
        sub_len = subquery.shape[0]
        for t in range(sub_len):
            lab = labels[t * fsm + shift]
            song_id = np.searchsorted(song_pos, lab, side="right") - 1
            song_t = lab - song_pos[song_id] - t
            candidates.append(np.stack([song_id, song_t], axis=1))
        candidates = np.unique(np.concatenate(candidates), axis=0)
        for song_id, t in candidates:
            song_start = song_pos[song_id]
            song_len = song_pos[song_id + 1] - song_start
            real_time = (t - shift / fsm) * hop_size
            sco = 0.0
            for i in range(sub_len):
                if 0 <= t + i < song_len:
                    ip = float(np.dot(db[song_start + t + i], subquery[i]))
                    if score_alpha > 0:
                        sco += np.exp(-score_alpha * (1.0 - ip) ** 2)
                    else:
                        sco += ip
            sco /= sub_len
            if sco > song_score[song_id, 0]:
                song_score[song_id, 0] = sco
                song_score[song_id, 1] = real_time
            if sco > best:
                best = sco
                best_song_t = (song_id, real_time)
    return best, best_song_t, song_score


def make_db(rng, n_songs=7, min_len=5, max_len=40, d=16):
    lens = rng.integers(min_len, max_len, n_songs)
    song_pos = np.pad(np.cumsum(lens.astype(np.int64)), (1, 0))
    db = rng.standard_normal((song_pos[-1], d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    return db, song_pos


def run_engine(db, song_pos, query, top_k, hop_size, fsm=1, alpha=0.0, pad_to=None):
    import jax.numpy as jnp

    S = query.shape[0] if pad_to is None else pad_to
    qpad = np.zeros((S, db.shape[1]), dtype=np.float32)
    qpad[: query.shape[0]] = query
    valid = np.zeros(S, dtype=bool)
    valid[: query.shape[0]] = True
    song_max, song_time = search_and_rerank(
        jnp.asarray(db),
        jnp.asarray(song_pos, jnp.int32),
        jnp.asarray(qpad),
        jnp.asarray(valid),
        top_k=top_k,
        n_songs=len(song_pos) - 1,
        frame_shift_mul=fsm,
        score_alpha=alpha,
        backend="exact",
    )
    return finalize_song_scores(
        np.asarray(song_max), np.asarray(song_time), hop_size, fsm
    )


@pytest.mark.parametrize("fsm", [1, 2])
@pytest.mark.parametrize("alpha", [0.0, 4.0])
def test_matches_naive_reference(fsm, alpha):
    rng = np.random.default_rng(0)
    db, song_pos = make_db(rng)
    # query = perturbed window of song 3
    start, qlen = song_pos[3] + 2, 9 * fsm
    query = db[start : start + qlen].copy()
    # at fsm>1 the reference treats consecutive rows as sub-hop shifts of
    # the same timeline; synthesize accordingly (every fsm-th row aligned)
    query = query[: qlen // fsm * fsm]
    query += 0.05 * rng.standard_normal(query.shape).astype(np.float32)
    query /= np.linalg.norm(query, axis=1, keepdims=True)

    ref = naive_query(db, song_pos, query, 10, 0.5, fsm=fsm, score_alpha=alpha)
    ours = run_engine(db, song_pos, query, 10, 0.5, fsm=fsm, alpha=alpha)

    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-4)  # best score
    assert ours[1][0] == ref[1][0]                           # best song
    np.testing.assert_allclose(ours[1][1], ref[1][1], atol=1e-5)  # best time
    np.testing.assert_allclose(ours[2][:, 0], ref[2][:, 0], rtol=1e-4, atol=1e-5)
    # times only comparable where a positive score was recorded
    rec = ref[2][:, 0] > 0
    np.testing.assert_allclose(ours[2][rec, 1], ref[2][rec, 1], atol=1e-5)


def test_padding_invariance():
    rng = np.random.default_rng(1)
    db, song_pos = make_db(rng)
    query = db[song_pos[2] : song_pos[2] + 7].copy()
    a = run_engine(db, song_pos, query, 5, 0.5)
    b = run_engine(db, song_pos, query, 5, 0.5, pad_to=32)
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)
    assert a[1][0] == b[1][0]
    np.testing.assert_allclose(a[2], b[2], rtol=1e-5, atol=1e-6)


def test_exact_topk_self_retrieval():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    db, _ = make_db(rng, n_songs=4)
    scores, labels = mips_topk(jnp.asarray(db), jnp.asarray(db[:5]), 3)
    assert np.asarray(labels)[:, 0].tolist() == [0, 1, 2, 3, 4]


def test_clean_query_finds_exact_offset():
    rng = np.random.default_rng(3)
    db, song_pos = make_db(rng, n_songs=10, min_len=20, max_len=60)
    song, off = 6, 5
    query = db[song_pos[song] + off : song_pos[song] + off + 10].copy()
    best, (ans, tim), _ = run_engine(db, song_pos, query, 10, 0.5)
    assert ans == song
    assert tim == pytest.approx(off * 0.5)
    assert best == pytest.approx(1.0, abs=1e-4)


def test_database_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    db, song_pos = make_db(rng, n_songs=5, d=8)
    counts = np.diff(song_pos).astype(np.int32)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("song%d.wav\n" % i for i in range(5)))
    write_index_meta(dbdir, d=8)

    database = Database(dbdir, {"top_k": 4, "backend": "exact"}, hop_size=0.5)
    query = db[song_pos[1] + 3 : song_pos[1] + 9]
    best, (ans, tim), song_score = database.query_embeddings(query)
    assert ans == 1
    assert tim == pytest.approx(1.5)
    assert best == pytest.approx(1.0, abs=1e-3)
    assert song_score.shape == (5, 2)

    # batched path agrees with the single path
    q2 = db[song_pos[3] + 1 : song_pos[3] + 8]
    outs = database.query_embeddings_batch([query, q2])
    assert outs[0][1][0] == 1 and outs[1][1][0] == 3
    np.testing.assert_allclose(outs[0][0], best, rtol=1e-3)


@pytest.mark.parametrize("params,fsm", [
    ({"top_k": 4, "backend": "exact"}, 1),
    ({"top_k": 4, "backend": "exact", "frame_shift_mul": 2}, 2),
    ({"top_k": 4, "backend": "exact", "screen": True, "screen_pool_k": 2,
      "screen_top_m": 2, "screen_rescue": 0.4}, 1),
    ({"top_k": 4, "backend": "exact", "sharded": True}, 1),
    ({"top_k": 4, "backend": "exact", "sharded": True, "screen": True,
      "screen_pool_k": 2, "screen_top_m": 2, "screen_rescue": 0.4}, 1),
])
def test_database_query_top1_batch(tmp_path, params, fsm):
    """Database.query_top1_batch (the [B]-D2H serving answer API) must
    return query_embeddings_batch's argmax: same song, score, and
    second-unit time — across fsm>1 sub-hop merging and the screen
    engine's fused rescue."""
    rng = np.random.default_rng(6)
    db, song_pos = make_db(rng, n_songs=12, min_len=20, max_len=40, d=16)
    counts = np.diff(song_pos).astype(np.int32)
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    db.tofile(os.path.join(dbdir, "embeddings"))
    counts.tofile(os.path.join(dbdir, "landmarkKey"))
    with open(os.path.join(dbdir, "songList.txt"), "w") as f:
        f.write("".join("song%d.wav\n" % i for i in range(12)))
    write_index_meta(dbdir, d=16)

    database = Database(dbdir, params, hop_size=0.5)
    queries = []
    for song, off, n in ((1, 3, 6 * fsm), (7, 0, 9 * fsm), (4, 8, 7 * fsm)):
        q = db[song_pos[song] + off :][:n].copy()
        q += 0.15 * rng.standard_normal(q.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        queries.append(q)

    want = database.query_embeddings_batch(queries)
    got = database.query_top1_batch(queries)
    assert len(got) == len(want)
    for (gb, (gs, gt)), (wb, (ws, wt), _) in zip(got, want):
        assert gs == ws
        assert gb == pytest.approx(wb, rel=1e-4)
        assert gt == pytest.approx(wt, abs=1e-6)


def test_empty_db(tmp_path):
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    np.zeros((0,), np.float32).tofile(os.path.join(dbdir, "embeddings"))
    np.zeros((0,), np.int32).tofile(os.path.join(dbdir, "landmarkKey"))
    open(os.path.join(dbdir, "songList.txt"), "w").close()
    write_index_meta(dbdir, d=8)
    database = Database(dbdir, {"top_k": 4}, hop_size=0.5)
    best, (ans, tim), song_score = database.query_embeddings(
        np.zeros((3, 8), np.float32)
    )
    assert ans == -1 and song_score.shape == (0, 2)


def test_merge_dbs(tmp_path):
    """tools/merge_dbs.py: shard concatenation preserves the DB-dir
    contract — the merged Database answers queries from every shard at
    the right (song, offset), and refuses mismatched dims."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.merge_dbs import merge_dbs

    rng = np.random.default_rng(6)
    shards, embs, poss = [], [], []
    for k, n_songs in enumerate((4, 3)):
        db, song_pos = make_db(rng, n_songs=n_songs, d=8)
        sdir = str(tmp_path / ("shard%d" % k))
        os.makedirs(sdir)
        db.tofile(os.path.join(sdir, "embeddings"))
        np.diff(song_pos).astype(np.int32).tofile(
            os.path.join(sdir, "landmarkKey"))
        with open(os.path.join(sdir, "songList.txt"), "w") as f:
            f.write("".join("sh%d_%d.wav\n" % (k, i)
                            for i in range(n_songs)))
        # shard 0 carries a build-time layout pad (indexer.max_query_sec
        # contract) — the merge must not drop it
        write_index_meta(sdir, d=8,
                         meta={"align_pad": 48} if k == 0 else None)
        if k == 0:
            with open(os.path.join(sdir, "configs.json"), "w") as f:
                json.dump({"indexer": {"top_k": 4}}, f)
        shards.append(sdir)
        embs.append(db)
        poss.append(song_pos)

    out = str(tmp_path / "merged")
    info = merge_dbs(out, shards)
    assert info["n_songs"] == 7
    assert info["ntotal"] == embs[0].shape[0] + embs[1].shape[0]
    assert os.path.exists(os.path.join(out, "configs.json"))
    with open(os.path.join(out, "index_meta.json")) as f:
        assert json.load(f).get("align_pad") == 48

    database = Database(out, {"top_k": 4, "backend": "exact"}, hop_size=0.5)
    assert database.songList[:2] == ["sh0_0.wav", "sh0_1.wav"]
    assert database.songList[-1] == "sh1_2.wav"
    # query a song from each shard: shard-1 songs are re-numbered 4..6
    q0 = embs[0][poss[0][2] + 1 : poss[0][2] + 6]
    q1 = embs[1][poss[1][1] + 2 : poss[1][1] + 7]
    outs = database.query_embeddings_batch([q0, q1])
    assert outs[0][1][0] == 2
    assert outs[1][1][0] == 4 + 1
    assert outs[0][1][1] == pytest.approx(0.5)
    assert outs[1][1][1] == pytest.approx(1.0)

    # dim mismatch refused
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    np.zeros((4, 16), np.float32).tofile(os.path.join(bad, "embeddings"))
    np.full(1, 4, np.int32).tofile(os.path.join(bad, "landmarkKey"))
    with open(os.path.join(bad, "songList.txt"), "w") as f:
        f.write("x.wav\n")
    write_index_meta(bad, d=16)
    with pytest.raises(AssertionError, match="dim mismatch"):
        merge_dbs(str(tmp_path / "m2"), [shards[0], bad])
