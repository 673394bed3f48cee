"""SpecAugment-style cutout masking, on-device.

Parity target: reference datautil/specaug.py:3-42 — a single mask per
batch combining (1) a rectangular cutout box, (2) a full-height frequency
stripe, (3) a full-width time stripe; each extent is a uniform fraction in
[cutout_min, cutout_max] of the axis.  The reference applies one mask to
the whole flattened batch on the GPU (train.py:81); we do the same on the
TPU, but with an explicit JAX PRNG key instead of global torch state.

TPU-native: the mask is built from broadcasted iota comparisons (no
dynamic-shape slicing), so the whole augment is a fused elementwise kernel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


class SpecAugment:
    def __init__(self, params: dict[str, Any]):
        self.cutout_min = params.get("cutout_min", 0.1)
        self.cutout_max = params.get("cutout_max", 0.5)

    def get_mask(self, key: jax.Array, F: int, T: int) -> jnp.ndarray:
        """Boolean-ish {0,1} mask of shape [F, T]; 1 = erase."""
        lo, hi = self.cutout_min, self.cutout_max
        kf, kf0, kt, kt0, kf2, kf02, kt2, kt02 = jax.random.split(key, 8)

        def stripe(size, kk, kk0):
            frac = lo + jax.random.uniform(kk) * (hi - lo)
            ext = jnp.floor(size * frac).astype(jnp.int32)
            start = jax.random.randint(kk0, (), 0, size - ext + 1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
            return (pos >= start) & (pos < start + ext)

        # cutout box
        box = stripe(F, kf, kf0)[:, None] & stripe(T, kt, kt0)[None, :]
        # full frequency stripe + full time stripe
        fstripe = stripe(F, kf2, kf02)[:, None]
        tstripe = stripe(T, kt2, kt02)[None, :]
        return (box | fstripe | tstripe).astype(jnp.float32)

    def augment(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., F, T]; one shared mask for the whole batch
        (specaug.py:39-42)."""
        mask = self.get_mask(key, x.shape[-2], x.shape[-1])
        return x * (1.0 - mask)
