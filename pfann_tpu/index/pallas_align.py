"""Pallas TPU kernel: fused alignment scan.

The XLA version of the exhaustive-alignment engine (index/align.py)
materializes the [N, S*B] score tensor in HBM (bf16 ~3.7 GB per 64-query
batch against a 10k-track DB) and then re-reads it with a strided access
pattern for the diagonal reduction — measured ~13x off memory
speed-of-light.  This kernel fuses the block matmul and the diagonal
reduction so scores never leave VMEM:

    per grid step (one block of BN db rows + a HALO of the next block):
        scores = db_block @ qmat            (MXU, f32 accumulate)
        align[o, b] = sum_i scores[o+i, i*B + b]   (VPU shift-adds)

HBM traffic drops to db read (~390 MB bf16) + align write ([N, B] f32),
~10x less than the XLA path.

Grid/meta rules follow /opt/skills/guides/pallas_guide.md: block-unit
index maps, last-dim-128-or-full blocks, VMEM block specs, static shapes.
The HALO handling clamps the halo block at the grid edge; windows whose
scores would be affected start inside the layout's trailing zero pad and
are discarded by the caller (see index/align.py layout invariants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32  # supports query filters up to HALO+1 windows; == layout PAD


LANE_B = 128  # queries per kernel call — one full lane group per window row


def _align_kernel(S: int, BN: int, db_ref, halo_ref, q_ref, out_ref):
    x = jnp.concatenate([db_ref[:], halo_ref[0:HALO, :]], axis=0)  # [BN+HALO, d]
    scores = jnp.dot(
        x, q_ref[:], preferred_element_type=jnp.float32
    )  # [BN+HALO, S*LANE_B] in VMEM
    # diagonal reduction with 2D lane-aligned slices (Mosaic rejects a
    # reshape to a 64-lane last dim; 128-wide column groups slice cleanly)
    acc = scores[0:BN, 0:LANE_B]
    for i in range(1, S):
        acc = acc + scores[i : BN + i, i * LANE_B : (i + 1) * LANE_B]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("S", "block_n"))
def pallas_alignment(
    db: jnp.ndarray, qmat: jnp.ndarray, *, S: int, block_n: int = 512
) -> jnp.ndarray:
    """db [N, d] (N multiple of block_n, bf16); qmat [d, S*LANE_B]
    (column (i, b) = query b's window-row i, matching align.py's filter
    packing; callers zero-pad to exactly LANE_B=128 queries).
    Returns align [N, LANE_B] f32 where align[j, b] = sum_i db[j+i].q_b[i]
    (rows j > N - S use clamped-halo garbage — caller discards them)."""
    N, d = db.shape
    B = qmat.shape[1] // S
    assert B == LANE_B, (B, LANE_B)
    assert N % block_n == 0, (N, block_n)
    nb = N // block_n

    kernel = functools.partial(_align_kernel, S, block_n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_n, d),
                lambda i: (jnp.minimum(i + 1, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((d, qmat.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, B), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * d * S * B,
            bytes_accessed=N * d * db.dtype.itemsize + N * B * 4,
            transcendentals=0,
        ),
    )(db, db, qmat)


def alignment_pallas_available() -> bool:
    return jax.default_backend() == "tpu"
