"""Pallas TPU kernel: fused alignment scan with in-kernel per-song reduce.

The XLA version of the exhaustive-alignment engine (index/align.py)
materializes the [N, S*B] score tensor in HBM (~3.7 GB bf16 per 128-query
batch against a 10k-track DB) plus a [N, B] float32 alignment tensor and
int32 iota temporaries for the argmax — measured >10x off memory
speed-of-light.  This kernel fuses the whole per-song pipeline:

    per grid step (one group of G song regions, R rows each):
        x      = [db rows of the group | HALO zero rows]      (VMEM)
        scores = x @ qmat                          (MXU, f32 accumulate)
        align[o, b] = sum_i scores[o+i, i*B+b]     (VPU shift-adds)
        best/argoff = max/argmax over each region  (VPU reduce)

Only (best [G, B], argoff [G, B]) leave the chip per step, so HBM traffic
collapses to the db read (~390 MB bf16).  The zero halo is synthesized
in-kernel — valid because every region starts with PAD >= S-1 zero rows
(the layout invariant from index/align.py), so the rows following a group
are zeros anyway.

Constraints: B = 128 queries per call (one full lane group per window
row); S <= HALO; R and G*R multiples of 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32   # max supported windows per query filter; == layout PAD
LANE = 128    # queries per lane group (hardware lane width)
LANE_B = 1024  # queries per kernel call (LANE-multiples); larger batches
               # amortize the db-block read + per-step overhead: measured
               # 128q->6k, 256q->7.2k, 512q->9.9k, 1024q->14.3k queries/s
               # on v5e (10k-track DB); ~72 ms batch latency at 1024
PALLAS_G = 8  # song regions per grid step (>=8: output block sublane
              # constraint; VMEM budget scales with G*R rows)


def _align_reduce_kernel(S: int, G: int, R: int, B: int, db_ref, q_ref,
                         best_ref, off_ref):
    rows = G * R
    d = db_ref.shape[1]
    # int8 inputs accumulate in int32 on the MXU's double-rate int8 path
    # (the screened engine's coarse stage quantizes — stage-1 only ranks,
    # per-query scales cancel); everything else accumulates in f32.
    acc_dt = jnp.int32 if db_ref.dtype == jnp.int8 else jnp.float32
    x = jnp.concatenate(
        [db_ref[:], jnp.zeros((HALO, d), db_ref.dtype)], axis=0
    )  # [rows + HALO, d]
    bests, argoffs = [], []
    for lg in range(B // LANE):
        # One small matmul per window row, accumulated immediately: peak
        # VMEM stays ~2 MB per lane group (a monolithic x @ qmat holds a
        # (rows, S*B) f32 score tile — 12+ MB — which serialized the
        # pipeline: 243 ms vs 37 ms per 128-query batch at G=8 on v5e).
        acc = jnp.dot(
            x[0:rows], q_ref[:, lg * LANE : lg * LANE + LANE],
            preferred_element_type=acc_dt,
        )
        for i in range(1, S):
            col = i * B + lg * LANE
            acc = acc + jnp.dot(
                x[i : rows + i], q_ref[:, col : col + LANE],
                preferred_element_type=acc_dt,
            )
        a3 = acc.reshape(G, R, LANE)
        best = jnp.max(a3, axis=1)                               # [G, LANE]
        offs = jax.lax.broadcasted_iota(jnp.int32, a3.shape, 1)
        argoffs.append(jnp.max(jnp.where(a3 >= best[:, None, :], offs, -1), axis=1))
        bests.append(best)
    # int32 scores fit f32 exactly up to 2^24 (S*127*127*d caps well
    # below for the coarse stage's shapes); the f32 output block is the
    # common currency of both dtypes
    best_ref[:] = jnp.concatenate(bests, axis=1).astype(jnp.float32)
    off_ref[:] = jnp.concatenate(argoffs, axis=1)


@functools.partial(jax.jit, static_argnames=("S", "R", "G", "interpret"))
def pallas_alignment_reduce(
    db: jnp.ndarray, qmat: jnp.ndarray, *, S: int, R: int, G: int = 4,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """db [n_groups*G*R, d] (uniform-region layout, bf16); qmat
    [d, S*LANE_B] (column (i, b) = query b's window-row i).

    ``interpret=True`` runs the kernel in Pallas interpret mode — used by
    the CPU-mesh tests to prove shard-parity of the pallas layout without
    TPU hardware.

    Returns (best [n_songs_padded, LANE_B] f32 summed alignment,
    argoff [n_songs_padded, LANE_B] int32 window offset in the region)."""
    N, d = db.shape
    B = qmat.shape[1] // S
    assert B % LANE == 0, (qmat.shape, S)
    assert S <= HALO + 1
    assert N % (G * R) == 0, (N, G, R)
    ng = N // (G * R)

    kernel = functools.partial(_align_reduce_kernel, S, G, R, B)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ng * G, B), jnp.float32),
            jax.ShapeDtypeStruct((ng * G, B), jnp.int32),
        ),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((G * R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d, S * B), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * d * S * B,
            bytes_accessed=N * d * db.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(db, qmat)


def alignment_pallas_available() -> bool:
    return jax.default_backend() == "tpu"
