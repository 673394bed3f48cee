"""Exhaustive-alignment retrieval engine (TPU-native redesign).

The reference pipeline is: per-segment ANN top-k (faiss IVF-PQ,
database.py:121) -> candidate (song, offset) pairs -> sequence-alignment
rerank over candidates (database.py:142-163 / seqscore.cpp:87-112).  Both
stages approximate one quantity: the best mean-inner-product alignment of
the query against every possible offset of every song — exactly what the
reference's *oracle* computes for the true song (matchfromgt.py:127-147).

On a TPU the approximation is unnecessary: scoring EVERY offset is one
big matmul plus a diagonal reduction,

    align[j, b] = sum_i  db[j + i] . q_b[i]

i.e. a 1-D convolution of the DB sequence with the query as filter.
Recall is 100% by construction (vs IVF-PQ nprobe=50), and search + rerank
collapse into one fused device program.

Layout: every song occupies a fixed-size region of R = PAD + Lmax rows —
PAD leading zeros, the song's embeddings, zero slack.  Consequences:
  * window overhang at song boundaries contributes exactly zero (the
    reference's out-of-range convention, database.py:151-155), and
    negative offsets down to -PAD are scored;
  * the per-song maximum is a dense [n_songs, R, B] reshape + reduce —
    no scatter (TPU scatters serialize; an early segment_max version of
    this engine was 30x slower than the matmul it followed).

Complexity: N * S * d MACs per query — what the reference's rerank would
cost if its candidate set covered all offsets; on the MXU with a batch of
queries this is cheap (~6 GFLOP per 10 s query against a 10k-track DB).
The streaming cost is the [N, S*B] bf16 score tensor.

The ``score_alpha > 0`` scoring variant (exp(-alpha (1-ip)^2),
seqscore.cpp:103-110) is nonlinear in the inner product but still rides
this engine: the transform is applied elementwise to each per-window
score slice BEFORE the diagonal sum (the XLA path materializes exactly
those slices).  Two masks make it exact: out-of-song windows must
contribute 0 (not exp(-alpha)) — the reference's out-of-range convention
(seqscore.cpp:96-101) that the alpha=0 path gets for free from the zero
padding — so a per-row validity vector and a per-query window-count mask
zero them explicitly.  alpha forces the XLA impl (the Pallas kernel
accumulates window dots without materializing them).  Queries longer
than PAD windows still fall back to the top-k + rerank engine — unless
the engine was built with a larger ``pad`` (``align_pad`` in the indexer
params), which is the supported way to serve e.g. 60 s MIREX queries on
the fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PAD = 32  # supports query windows up to 32 segments (> 10 s default)


def build_uniform_layout(
    embeddings: np.ndarray,
    counts: np.ndarray,
    pad: int = DEFAULT_PAD,
    align_to: int = 1,
    round_r_to: int = 1,
    pad_songs_to: int = 1,
    trailing_pad: bool = True,
) -> tuple[np.ndarray, int]:
    """Re-pack the flat embedding matrix into uniform per-song regions of
    R = pad + max(counts) rows: [pad zeros | song rows | slack zeros].

    Returns (db_padded, R).  Options serve the two engine impls:
      * XLA: trailing_pad keeps the last song's overhanging windows
        in-bounds; align_to rounds total rows up.
      * Pallas: round_r_to/pad_songs_to make R a sublane multiple and the
        song count a multiple of the kernel's song-group size (the kernel
        synthesizes the trailing zeros itself).
    """
    n_songs = len(counts)
    d = embeddings.shape[1] if embeddings.size else 0
    lmax = int(counts.max()) if n_songs else 0
    R = -(-(pad + lmax) // round_r_to) * round_r_to
    n_eff = -(-max(n_songs, 1) // pad_songs_to) * pad_songs_to
    total = n_eff * R + (pad if trailing_pad else 0)
    total = -(-total // align_to) * align_to
    db = np.zeros((total, d), dtype=np.float32)
    song_pos = np.pad(np.cumsum(counts, dtype=np.int64), (1, 0))
    # vectorized region fill (a per-song Python loop is minutes of build
    # latency at 100k tracks): row r of `embeddings` (song s, intra-song
    # index r - song_pos[s]) lands at s*R + pad + (r - song_pos[s])
    counts = np.asarray(counts, dtype=np.int64)
    if n_songs and song_pos[-1]:
        song_of = np.repeat(np.arange(n_songs, dtype=np.int64), counts)
        intra = np.arange(song_pos[-1], dtype=np.int64) - song_pos[song_of]
        db[song_of * R + pad + intra] = embeddings
    return db, R


def alignment_core(
    db: jnp.ndarray,
    queries: jnp.ndarray,
    *,
    R: int,
    S: int,
    n_songs: int,
    score_dtype=jnp.bfloat16,
    impl: str = "xla",
    interpret: bool = False,
    score_alpha: float = 0.0,
    row_valid: jnp.ndarray | None = None,
    q_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """db [>= n_songs*R + pad, d]; queries [B, S, d].

    Returns (song_best [B, n_songs] f32 — summed alignment score,
    song_argoff [B, n_songs] int32 — best window offset within the region,
    i.e. t + pad).  Pure function (also used inside shard_map — see
    pfann_tpu/parallel/sharded_search.py).

    score_alpha > 0 switches the per-window contribution from the raw
    inner product to exp(-alpha (1 - ip)^2) ("query adaptive similarity",
    seqscore.cpp:103-110), applied to each diagonal slice before the sum.
    It requires row_valid [N] (1.0 on real song rows, 0.0 on layout
    padding) and accepts q_valid [S, B] (1.0 where window row i belongs
    to query b) so masked positions contribute 0 — the reference's
    out-of-range convention — instead of exp(-alpha).  XLA impl only.
    """
    N, d = db.shape
    B = queries.shape[0]

    qsT = jnp.transpose(queries, (2, 1, 0)).reshape(d, S * B)

    if impl == "pallas":
        from pfann_tpu.index.pallas_align import (
            HALO,
            PALLAS_G,
            pallas_alignment_reduce,
        )

        if score_alpha != 0.0:
            raise NotImplementedError(
                "score_alpha requires the XLA alignment impl"
            )
        if S <= HALO + 1:
            best, argoff = pallas_alignment_reduce(
                db, qsT.astype(db.dtype), S=S, R=R, G=PALLAS_G,
                interpret=interpret
            )
            return (
                jnp.transpose(best[:n_songs]),
                jnp.transpose(argoff[:n_songs]),
            )
        # the fused kernel's per-block zero halo is fixed at 32 rows
        # (~16 s queries); MIREX-length queries (60 s = 119 windows)
        # fall through to the XLA path — they reach here only through
        # the stage-3 rescue of a long-query layout (align_pad >= S-1),
        # which chunks the [N, S, B] score tensor at 4 GiB

    # the XLA diagonal slices read rows [i, n_songs*R + i) for i < S:
    # layouts built for the Pallas kernel carry no trailing tail (the
    # kernel zero-extends per block in VMEM), so a long-query fallback
    # from the branch above would run off the end — zero-extend here
    # (zero rows contribute zero score; ~S rows of HBM, trivial)
    need = n_songs * R + S - 1 - N
    if need > 0:
        db = jnp.concatenate(
            [db, jnp.zeros((need, d), db.dtype)], axis=0
        )
        if row_valid is not None:
            row_valid = jnp.concatenate(
                [row_valid, jnp.zeros((need,), row_valid.dtype)]
            )
        N += need

    if db.dtype == jnp.int8 and queries.dtype == jnp.int8:
        # int8 exact stage (screen.py): keep the operands int8 so the
        # matmul rides the MXU's double-rate int8 path; accumulate int32
        # (the diagonal sums cast to f32 below — exact up to ~2^24, and
        # quantization noise dominates far before that matters)
        scores = jnp.matmul(
            db, qsT, preferred_element_type=jnp.int32
        ).reshape(N, S, B)
    else:
        scores = jnp.matmul(
            db.astype(score_dtype), qsT.astype(score_dtype),
            preferred_element_type=score_dtype,
        ).reshape(N, S, B)

    N0 = n_songs * R

    def slice_contrib(i):
        sl = scores[i : N0 + i, i, :].astype(jnp.float32)
        if score_alpha == 0.0:
            return sl
        l2 = 1.0 - sl
        c = jnp.exp(-score_alpha * l2 * l2)
        if row_valid is not None:
            c = c * row_valid[i : N0 + i][:, None]
        if q_valid is not None:
            c = c * q_valid[i][None, :]
        return c

    align = slice_contrib(0)
    for i in range(1, S):
        align = align + slice_contrib(i)

    return _reduce_per_song(align, n_songs, R, B)


_alignment_search_uniform = functools.partial(
    jax.jit,
    static_argnames=(
        "R", "S", "n_songs", "score_dtype", "impl", "interpret", "score_alpha"
    ),
)(alignment_core)


def build_row_valid(
    counts: np.ndarray, R: int, pad: int, total: int
) -> np.ndarray:
    """f32 [total] marker of real song rows in a uniform layout (1.0 on
    rows holding embeddings, 0.0 on pad/slack) — the out-of-range mask
    the alpha scoring path multiplies into each window contribution."""
    rv = np.zeros(total, dtype=np.float32)
    counts = np.asarray(counts, dtype=np.int64)
    if len(counts) and counts.sum():
        song_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        intra = np.arange(counts.sum(), dtype=np.int64) - np.pad(
            np.cumsum(counts), (1, 0)
        )[song_of]
        rv[song_of * R + pad + intra] = 1.0
    return rv


def _reduce_per_song(align: jnp.ndarray, n_songs: int, R: int, B: int):
    align = align.reshape(n_songs, R, B)
    song_best = jnp.max(align, axis=1)            # [n_songs, B]
    # two-pass argmax (plain reduces lower better on TPU than the fused
    # variadic max+argmax reduce)
    offs = jax.lax.broadcasted_iota(jnp.int32, align.shape, 1)
    is_best = align >= song_best[:, None, :]
    song_argoff = jnp.max(jnp.where(is_best, offs, -1), axis=1)
    return jnp.transpose(song_best), jnp.transpose(song_argoff).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("pad",))
def _top1(best: jnp.ndarray, argoff: jnp.ndarray, pad: int):
    """best/argoff [B, n_songs] -> (song [B], score_sum [B], t [B])."""
    song = jnp.argmax(best, axis=1)
    take = jax.vmap(lambda b, o, s: (b[s], o[s]))(best, argoff, song)
    return song.astype(jnp.int32), take[0], (take[1] - pad).astype(jnp.float32)


class AlignmentEngine:
    """Host wrapper: uniform padded layout + per-shift filter construction
    + time mapping.  One instance per loaded database (single device)."""

    def __init__(
        self,
        embeddings: np.ndarray,
        counts: np.ndarray,
        pad: int = DEFAULT_PAD,
        score_dtype=jnp.bfloat16,
        device=None,
        max_batch_rows: int = 16,
        impl: str = "auto",
        score_alpha: float = 0.0,
    ):
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if score_alpha != 0.0 and impl == "pallas":
            # the fused kernel accumulates window dots without ever
            # materializing them; the alpha transform needs the per-window
            # slices, so alpha rides the XLA impl (see module docstring)
            impl = "xla"
        if impl == "pallas":
            from pfann_tpu.index.pallas_align import HALO

            if pad > HALO:
                # the kernel synthesizes a HALO-row zero halo per song
                # group; filters longer than HALO windows would read into
                # the next group.  A pad that large means the user wants
                # long (e.g. 60 s) queries -> XLA impl
                impl = "xla"
        self.impl = impl
        self.score_alpha = float(score_alpha)
        if impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE_B, PALLAS_G

            # the fused kernel processes one full lane group of queries
            max_batch_rows = LANE_B
            db, R = build_uniform_layout(
                embeddings, counts, pad,
                round_r_to=8, pad_songs_to=PALLAS_G, trailing_pad=False,
            )
        else:
            db, R = build_uniform_layout(embeddings, counts, pad)
        self.pad = pad
        self.R = R
        self.n_songs = len(counts)
        self.d = db.shape[1]
        self.score_dtype = score_dtype
        self.max_batch = max_batch_rows
        from pfann_tpu.utils.fastcast import host_cast

        self._db = jax.device_put(
            jnp.asarray(host_cast(db, score_dtype)), device
        )
        self._row_valid = None
        if self.score_alpha != 0.0:
            self._row_valid = jax.device_put(
                jnp.asarray(build_row_valid(counts, R, pad, db.shape[0])),
                device,
            )

    def max_query_windows(self) -> int:
        return self.pad  # longer filters could cross into the next region

    # HBM ceiling for the XLA impl's [N, S, B] score tensor: long (60 s,
    # S=119) queries against big layouts shrink the dispatch batch so the
    # materialized scores stay well under device memory
    SCORE_BYTES_CAP = 4 << 30

    def _chunk_for(self, S: int) -> int:
        if self.impl != "xla":
            return self.max_batch
        itemsize = 2 if self.score_dtype == jnp.bfloat16 else 4
        per_b = int(self._db.shape[0]) * S * itemsize
        return max(1, min(self.max_batch, self.SCORE_BYTES_CAP // max(per_b, 1)))

    def search_device(self, filters: np.ndarray, sub_lens=None) -> list:
        """Dispatch alignment over max_batch-row chunks WITHOUT pulling
        results to the host — returns a list of (best, argoff) device
        array pairs.  Lets callers pipeline many batches (the sandbox TPU
        tunnel has a large fixed host-sync cost per call).

        sub_lens [B] (optional): true window counts per query — only
        consulted by the alpha scoring path, where a zero filter row must
        contribute 0 rather than exp(-alpha); omitted means every row is
        a real window."""
        B, S, _ = filters.shape
        mb = self._chunk_for(S)
        outs = []
        for i in range(0, B, mb):
            chunk = filters[i : i + mb]
            n = chunk.shape[0]
            if n < mb:
                chunk = np.concatenate(
                    [chunk,
                     np.zeros((mb - n, S, self.d),
                              np.float32)]
                )
            q_valid = None
            if self.score_alpha != 0.0:
                if sub_lens is None:
                    lens = np.full(n, S, np.int32)
                else:
                    lens = np.asarray(sub_lens[i : i + n])
                lens = np.pad(lens, (0, mb - n))
                q_valid = jnp.asarray(
                    (np.arange(S)[:, None] < lens[None, :]).astype(np.float32)
                )
            outs.append(
                _alignment_search_uniform(
                    self._db,
                    jnp.asarray(chunk),
                    R=self.R,
                    S=S,
                    n_songs=self.n_songs,
                    score_dtype=self.score_dtype,
                    impl=self.impl,
                    score_alpha=self.score_alpha,
                    row_valid=self._row_valid,
                    q_valid=q_valid,
                )
            )
        return outs

    def search_top1_device(self, filters) -> list:
        """Serving fast path: per query only (best_song, best_score_sum,
        best_t) leave the device — the full per-song table (query_
        embeddings' song_score output) stays on-chip.  Returns a list of
        device-array triples per max_batch chunk."""
        outs = []
        for best, argoff in self.search_device(filters):
            outs.append(_top1(best, argoff, self.pad))
        return outs

    def search_top1(self, qpad, sub_lens=None):
        """Synced top-1 serving answers (host arrays): (song [B] int32,
        score_sum [B] f32, t [B] f32 — DB-hop units from song start).
        The exhaustive engine's answers ARE the rescued contract
        (recall 1.0 by construction); sub_lens is accepted for API
        symmetry with ScreenedAlignmentEngine.search_top1 (score sums
        are over the zero-padded filters either way)."""
        B = qpad.shape[0]
        outs = self.search_top1_device(qpad)
        song = np.concatenate([np.asarray(o[0]) for o in outs])[:B]
        best = np.concatenate(
            [np.asarray(o[1]) for o in outs]
        )[:B].astype(np.float32)
        t = np.concatenate([np.asarray(o[2]) for o in outs])[:B]
        return song, best, t

    def search(
        self, filters: np.ndarray, sub_lens: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """filters [B, S, d] (zero rows beyond sub_lens[b]); returns
        (song_score [B, n_songs] — mean alignment, song_t [B, n_songs] —
        offset in DB-hop units relative to song start)."""
        B = filters.shape[0]
        outs = self.search_device(filters, sub_lens)
        outs_best = [np.asarray(b) for b, _ in outs]
        outs_off = [np.asarray(o) for _, o in outs]
        song_best = np.concatenate(outs_best)[:B]
        song_off = np.concatenate(outs_off)[:B]
        song_score = (song_best / np.maximum(sub_lens, 1)[:, None]).astype(np.float32)
        song_t = (song_off - self.pad).astype(np.float32)
        return song_score, song_t


def queries_to_filters(
    query: np.ndarray, frame_shift_mul: int, max_windows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split one query [S_rows, d] (rows at hop/frame_shift_mul stride)
    into per-shift filters (database.py:129-134 semantics).

    Returns (filters [fsm, S_max, d], sub_lens [fsm], shifts [fsm])."""
    fsm = frame_shift_mul
    subs = [query[s::fsm] for s in range(fsm)]
    S_max = min(max(len(s) for s in subs), max_windows)
    filters = np.zeros((fsm, S_max, query.shape[1]), dtype=np.float32)
    sub_lens = np.zeros(fsm, dtype=np.int32)
    for s, sub in enumerate(subs):
        n = min(len(sub), S_max)
        filters[s, :n] = sub[:n]
        sub_lens[s] = n
    return filters, sub_lens, np.arange(fsm)
