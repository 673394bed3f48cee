"""NT-Xent contrastive loss, vectorized.

Parity target: reference train.py:41-52 — rows are interleaved
(anchor_0, positive_0, anchor_1, positive_1, ...); for each row i the
reference *deletes* column i from the similarity row (not a -inf mask) and
takes log-softmax at the positive's post-deletion index.  Deleting column
i and renormalizing is mathematically identical to masking the diagonal
with -inf inside the logsumexp, so the vectorized form below is exact:

    L_i = -(a[i, partner(i)] - logsumexp_{k != i} a[i, k]),
    partner(i) = i XOR 1   (i+1 for even i, i-1 for odd i)

TPU-native: one [n, n] matmul on the MXU + fused masked logsumexp.  No
per-row Python loop (the reference loops over the batch), and no need for
the reference's gradient-cache two-pass trick (train.py:82-97) — large
batches fit on a TPU chip in bf16, and batches beyond one chip are handled
by data parallelism (psum), not host-side chunking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def similarity_loss(y: jnp.ndarray, tau: float) -> jnp.ndarray:
    """y: [n, d] L2-normalized embeddings, n even, rows interleaved
    (org, aug) pairs.  Returns scalar loss (mean over rows)."""
    n = y.shape[0]
    # [n, n] similarity matrix; full f32 precision — the matrix is tiny
    # relative to the encoder, and loss accuracy feeds the gradients
    a = (
        jnp.matmul(
            y, y.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        / tau
    )
    diag = jnp.eye(n, dtype=bool)
    a_masked = jnp.where(diag, -jnp.inf, a)
    lse = jax.nn.logsumexp(a_masked, axis=1)
    partner = jnp.arange(n) ^ 1
    pos = a[jnp.arange(n), partner]
    return jnp.mean(lse - pos)
