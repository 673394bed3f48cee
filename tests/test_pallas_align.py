"""Pallas fused alignment+reduce kernel correctness (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import pfann_tpu.index.pallas_align as pa
from pfann_tpu.index.align import build_uniform_layout


@pytest.mark.parametrize("B", [128, pa.LANE_B])
def test_pallas_alignment_reduce_interpret(monkeypatch, B):
    """B=128 is a sub-LANE_B kernel call — the batch size bench.py's
    --batch-sweep dispatches when it lowers engine.max_batch (the kernel
    takes B from the input shape; only B % LANE == 0 is required)."""
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa.pl, "pallas_call", interp)

    rng = np.random.default_rng(0)
    d, S, pad = 128, 7, 16
    counts = np.asarray([20, 5, 33, 12, 9])  # 5 songs -> padded to 8 (G=4)
    song_pos = np.pad(np.cumsum(counts), (1, 0))
    emb = rng.standard_normal((int(counts.sum()), d)).astype(np.float32)
    db, R = build_uniform_layout(
        emb, counts, pad=pad, round_r_to=8, pad_songs_to=pa.PALLAS_G,
        trailing_pad=False,
    )
    assert db.shape[0] % (pa.PALLAS_G * R) == 0

    qs = rng.standard_normal((B, S, d)).astype(np.float32) * 0.2
    qmat = np.transpose(qs, (2, 1, 0)).reshape(d, S * B)
    best, argoff = pa.pallas_alignment_reduce(
        jnp.asarray(db), jnp.asarray(qmat), S=S, R=R, G=pa.PALLAS_G
    )
    best, argoff = np.asarray(best), np.asarray(argoff)

    # naive per-song best over all window starts in the region
    for song in range(5):
        start, length = song_pos[song], counts[song]
        for b in (0, 63, B - 1):
            scores = []
            for t in range(-pad, R - pad):
                s = sum(
                    float(emb[start + t + i] @ qs[b, i])
                    for i in range(S)
                    if 0 <= t + i < length
                )
                scores.append(s)
            ref_best = max(scores)
            assert abs(best[song, b] - ref_best) < 1e-2 * max(1.0, abs(ref_best)), (
                song, b, best[song, b], ref_best,
            )
            if ref_best > 1e-6:
                assert argoff[song, b] - pad == int(np.argmax(scores)) - pad

    # padded song slots reduce over all-zero regions -> best == 0
    assert np.allclose(best[5:], 0.0)


def test_engine_pallas_layout_alignment():
    rng = np.random.default_rng(1)
    counts = np.asarray([5, 9, 3])
    emb = rng.standard_normal((17, 16)).astype(np.float32)
    db_x, R_x = build_uniform_layout(emb, counts, pad=8)
    assert R_x == 17  # pad 8 + lmax 9
    assert db_x.shape[0] == 3 * 17 + 8
    db_p2, R_p2 = build_uniform_layout(
        emb, counts, pad=8, round_r_to=8, pad_songs_to=4, trailing_pad=False
    )
    assert R_p2 == 24  # rounded up to a sublane multiple
    assert db_p2.shape[0] == 4 * R_p2  # songs padded to a group of 4
    # song rows preserved at region offsets
    song_pos = np.pad(np.cumsum(counts), (1, 0))
    for s in range(3):
        np.testing.assert_array_equal(
            db_p2[s * R_p2 + 8 : s * R_p2 + 8 + counts[s]],
            emb[song_pos[s] : song_pos[s + 1]],
        )


def test_alignment_core_pallas_long_query_fallback():
    """alignment_core(impl='pallas') with S > HALO+1 (a MIREX-length
    query against an align_pad layout) must fall back to the XLA path
    instead of tripping the kernel's fixed-halo assert — measured crash:
    60 s (S=119) stage-3 rescue on the r5 eval DB."""
    from pfann_tpu.index.align import alignment_core

    rng = np.random.default_rng(1)
    d, S, pad = 128, pa.HALO + 9, 48
    counts = np.asarray([50, 44, 61])
    emb = rng.standard_normal((int(counts.sum()), d)).astype(np.float32)
    db, R = build_uniform_layout(
        emb, counts, pad=pad, round_r_to=8, pad_songs_to=pa.PALLAS_G,
        trailing_pad=False,
    )
    qs = jnp.asarray(
        rng.standard_normal((4, S, d)).astype(np.float32) * 0.2
    )
    # n_songs = ALL padded slots (how the screen rescue calls it): the
    # pallas-built layout then has ZERO trailing rows beyond
    # n_songs*R, so the XLA fallback must zero-extend before slicing
    # (second measured crash: (N, B) + (N-1, B) broadcast error)
    n_slots = db.shape[0] // R
    assert n_slots * R == db.shape[0]
    for ns in (3, n_slots):
        bp, op = alignment_core(
            jnp.asarray(db), qs, R=R, S=S, n_songs=ns, impl="pallas",
            score_dtype=jnp.float32,
        )
        bx, ox = alignment_core(
            jnp.asarray(db), qs, R=R, S=S, n_songs=ns, impl="xla",
            score_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bx),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(op), np.asarray(ox))
