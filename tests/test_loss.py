"""NT-Xent loss: vectorized implementation vs a literal numpy transcription
of the reference's per-row column-deletion semantics (train.py:41-52)."""

import jax
import numpy as np

from pfann_tpu.train.loss import similarity_loss
from pfann_tpu.train.schedule import cosine_warm_restarts


def reference_loss_numpy(y, tau):
    """Row-by-row: delete column i, log-softmax, pick the positive at its
    post-deletion index (i if even else i-1) — train.py:41-52 verbatim
    semantics in numpy."""
    a = (y @ y.T) / tau
    n = y.shape[0]
    Ls = []
    for i in range(n):
        row = np.concatenate([a[i, :i], a[i, i + 1 :]])
        logsm = row - (np.max(row) + np.log(np.exp(row - np.max(row)).sum()))
        Ls.append(logsm[i if i % 2 == 0 else i - 1])
    return np.sum(Ls) / -n


def test_matches_reference_semantics():
    rng = np.random.default_rng(0)
    for n in (4, 8, 64):
        y = rng.standard_normal((n, 16)).astype(np.float32)
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        ours = float(similarity_loss(y, 0.05))
        ref = reference_loss_numpy(y.astype(np.float64), 0.05)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_perfect_pairs_low_loss():
    rng = np.random.default_rng(1)
    anchors = rng.standard_normal((32, 64)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    y = np.repeat(anchors, 2, axis=0)  # positive == anchor
    loss_aligned = float(similarity_loss(y, 0.05))
    y2 = rng.standard_normal((64, 64)).astype(np.float32)
    y2 /= np.linalg.norm(y2, axis=1, keepdims=True)
    loss_random = float(similarity_loss(y2, 0.05))
    assert loss_aligned < loss_random


def test_grad_is_finite():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((16, 8)).astype(np.float32)
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    g = jax.grad(lambda yy: similarity_loss(yy, 0.05))(y)
    assert np.isfinite(np.asarray(g)).all()


def test_cosine_schedule_endpoints():
    lr = cosine_warm_restarts(1e-4, t0=100, eta_min=1e-7)
    assert abs(lr(0) - 1e-4) < 1e-12
    assert lr(99) < lr(50) < lr(1)
    assert lr(99) > 1e-7
    # torch steps scheduler after each epoch; epoch t0 would restart
    assert abs(lr(100) - 1e-4) < 1e-12
