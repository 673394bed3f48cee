"""Fast host-side dtype staging for multi-GB device uploads.

``np.ndarray.astype(ml_dtypes.bfloat16)`` goes through ml_dtypes'
generic scalar cast loop — measured well under 100 MB/s on this class of
host, i.e. *minutes* of engine build latency for a 100k-track DB layout
(the screened engine stages ~5 GB of bf16; VERDICT r2 next #1 regime).
float32 -> bfloat16 is just round-to-nearest-even on bit 16 of the IEEE
bits, which numpy's vectorized integer ops do at memory bandwidth:

    u + 0x7FFF + ((u >> 16) & 1)  then take the top 16 bits.

Matches XLA/ml_dtypes RNE semantics for all finite values and +-inf
(max-float correctly rounds up to inf).  NaNs are handled by a separate
masked pass (the rounding add alone would wrap high-mantissa negative
NaNs around uint32 and emit +0.0); they quantize to a quiet NaN with the
sign and high payload bits preserved.  The generic path is kept for
every other (dtype, input) combination.
"""

from __future__ import annotations

import numpy as np


def host_cast(x: np.ndarray, dtype) -> np.ndarray:
    """``np.asarray(x, dtype)`` with a vectorized fast path for
    contiguous float32 -> bfloat16 (the DB-staging hot path)."""
    import ml_dtypes

    dt = np.dtype(dtype)
    if (
        dt != np.dtype(ml_dtypes.bfloat16)
        or np.asarray(x).dtype != np.float32
    ):
        return np.asarray(x, dtype=dt)
    x = np.ascontiguousarray(x)
    u = x.view(np.uint32)
    r = ((u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1)))
         >> np.uint32(16)).astype(np.uint16)
    nan = np.isnan(x)
    if nan.any():
        # force a quiet NaN: keep sign + high payload bits, set the
        # quiet bit (the rounding add above is only valid for non-NaNs)
        r[nan] = ((u[nan] >> np.uint32(16)) | np.uint32(0x0040)).astype(
            np.uint16
        )
    return r.view(ml_dtypes.bfloat16)


def int16_if_exact(wav: np.ndarray) -> np.ndarray:
    """int16 view of a decoded audio signal when that is EXACT (every
    value is k/32768 with |k| <= 32767 — true for un-resampled 16-bit
    WAV), else the float32 signal unchanged.  int16 halves the bytes a
    tunneled H2D moves and the on-device rescale by 1/32768 is a
    power-of-2 divide, so downstream f32 math is bit-identical."""
    w = np.asarray(wav, np.float32).reshape(-1)
    s = w * 32768.0
    if np.all(np.abs(s) <= 32767.0) and np.all(s == np.trunc(s)):
        return s.astype(np.int16)
    return w
