"""Pallas fused-alignment kernel correctness (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import pfann_tpu.index.pallas_align as pa


def test_pallas_alignment_interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa.pl, "pallas_call", interp)

    rng = np.random.default_rng(0)
    N, d, S, B = 1024, 128, 7, pa.LANE_B
    db = rng.standard_normal((N, d)).astype(np.float32)
    qs = rng.standard_normal((B, S, d)).astype(np.float32)
    qmat = np.transpose(qs, (2, 1, 0)).reshape(d, S * B)
    align = np.asarray(
        pa.pallas_alignment(jnp.asarray(db), jnp.asarray(qmat), S=S)
    )
    # spot-check diagonal sums (full loop is slow in interpret mode)
    for j in (0, 100, 511, 512, N - S):
        for b in (0, 17, B - 1):
            ref = sum(float(db[j + i] @ qs[b, i]) for i in range(S))
            assert abs(align[j, b] - ref) < 1e-2 * max(1.0, abs(ref))


def test_engine_pallas_layout_alignment():
    """Pallas layout rounds total rows to the block size and keeps song
    regions identical to the XLA layout."""
    from pfann_tpu.index.align import build_uniform_layout

    rng = np.random.default_rng(1)
    counts = np.asarray([5, 9, 3])
    emb = rng.standard_normal((17, 16)).astype(np.float32)
    db_x, R_x = build_uniform_layout(emb, counts, pad=8, align_to=1)
    db_p, R_p = build_uniform_layout(emb, counts, pad=8, align_to=512)
    assert R_x == R_p
    assert db_p.shape[0] % 512 == 0
    np.testing.assert_array_equal(db_p[: db_x.shape[0]], db_x)
    assert (db_p[db_x.shape[0] :] == 0).all()
