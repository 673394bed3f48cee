"""Two-stage screened retrieval: coarse prune + exact alignment.

This is the faiss-IVF role (reference builder.py:114 ``IVF200,PQ64x8np``,
database.py:121) re-imagined TPU-first.  The exhaustive-alignment engine
(index/align.py) is compute-bound at the MXU's bf16 peak, so scaling past
~10k tracks needs algorithmic *work reduction*, not faster kernels — but
an inverted-list index is the wrong shape for a TPU (data-dependent list
lengths, scatter/gather control flow).  Instead both stages stay dense:

  Stage 1 (screen): an overlap-POOLED copy of the database — bin j is
    the sum of rows [j*k, j*k + 2k), i.e. window 2k at stride k — is
    scanned with the same fused alignment kernel against COLLAPSED query
    filters qc[p] = sum of all query windows i with i//k == p.  For a
    true alignment at offset o (any phase r = o mod k), window i's
    matching row o+i always falls inside pooled bin (o//k) + i//k
    (because r + (i mod k) < 2k), so the coarse score of the true song
    concentrates around the FULL S matched inner products — not a
    strided subset — while impostors stay near 0.  The matmul still
    shrinks by k (pooled rows) * k (collapsed diagonals) ~= k^2 vs the
    exhaustive scan, because the window folding happens in the tiny
    filter, not the big operand.

  Stage 2 (exact): the top-M songs per query are gathered as whole
    regions [M, R, d] and rescored with the *exact* alignment sum at
    every offset — identical math to the exhaustive engine, so the final
    (score, offset) of any surviving song is bit-identical to it.

Unlike IVF (whose nprobe recall is a corpus-dependent gamble), the only
approximation here is the top-M cut on a signal with ~Sc/sigma of margin;
the recall guard test (tests/test_screen.py) asserts screened top-1 ==
exhaustive top-1 on noisy queries.

Regime boundary (measured on TPU, 600-song DB, d=128, S=19, k=4,
top_m=32): at per-window true cosine ~0.6 (production embeddings of
noisy audio) screen recall == exhaustive == 100%; pushed to cosine
~0.19 (query 96% noise by energy) the exhaustive scan still resolves
128/128 while the screen's survivor set drops the winner 18% of the
time — pooling sums the db's neighboring rows incoherently, so the
coarse stage pays an SNR price for its k^2 work cut.  Round-4
validation on a 20k-track REAL-embedding DB confirmed the regime: at
SNR -6 the true song's coarse rank has a catastrophic tail (p99 =
8,907 of 20,030 — no affordable top_m recovers it;
tools/screen_rank_diag.py, ACCURACY_r04.md).  The auto-upgrade from
the exhaustive engine now sits at 30k songs — the measured
align/screen throughput crossover (index/database.py).

  Stage 3 (rescue, the fix): a query whose best EXACT stage-2 score
    falls below ``rescue_threshold`` (mean-IP units, default 0.4) is
    rescored against the FULL resident layout — db3 doubles as a
    uniform alignment layout, so rescue is the exhaustive engine's
    exact math at zero extra HBM.  The best-exact score separates the
    two outcomes sharply: true alignments score >= ~0.45 while
    pruned-winner queries score <= ~0.35 at every SNR, so screened
    answers equal exhaustive answers, with escalation that prices only
    the noisy fraction of traffic (40% at SNR -6 down to ~0% clean).

Memory: pooled copy adds 1/k of the db; the gather materializes
[B, M, R, d] per batch (~1.3 GB bf16 at B=1024, M=32, 100k-track R) —
streamed, not resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pfann_tpu.index.align import DEFAULT_PAD, alignment_core


def coarse_dtype_of(name, default):
    """Normalize a coarse-stage dtype knob ('int8' | 'bf16' | 'f32' |
    None | a jnp dtype) to a jnp dtype.  int8 runs the coarse matmul on
    the MXU's double-rate int8 path — safe for stage 1 because it only
    RANKS songs per query (per-query quantization scales cancel) and the
    quantization noise (~1e-2 per window dot) is far inside the screen's
    ~8-sigma margin; stage 2 always rescores survivors exactly."""
    if name is None:
        return default
    if isinstance(name, str):
        table = {
            "int8": jnp.int8,
            "bf16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16,
            "f32": jnp.float32,
            "float32": jnp.float32,
        }
        if name not in table:
            raise ValueError("unknown coarse dtype %r" % (name,))
        return table[name]
    return name


def quantize_coarse_int8(coarse: np.ndarray) -> np.ndarray:
    """Host-side symmetric int8 quantization of the pooled coarse copy
    (one global scale — the scale never matters downstream: stage 1 only
    compares scores within a query).  In-place-ish: mutates its input
    (always a fresh build_screen_layout output) to avoid multi-GB
    temporaries at the 100k-track scale."""
    amax = float(np.abs(coarse).max()) if coarse.size else 0.0
    s = 127.0 / (amax or 1.0)
    np.multiply(coarse, s, out=coarse)
    np.rint(coarse, out=coarse)
    np.clip(coarse, -127, 127, out=coarse)
    return coarse.astype(np.int8)


def quantize_queries_int8(qc: jnp.ndarray) -> jnp.ndarray:
    """Device-side per-query symmetric int8 quantization of the collapsed
    query filters [B, Sc, d].  Per-QUERY scales are exact for stage 1:
    the top-M selection is a per-query argsort over songs, invariant to a
    positive per-query factor."""
    return quantize_queries_int8_scaled(qc)[0]


def quantize_queries_int8_scaled(
    qc: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Like :func:`quantize_queries_int8` but also returns the per-query
    DEQUANTIZATION scale [B] (amax/127, i.e. int32 accumulations times
    scale * db_scale recover approximate f32 inner products) — the exact
    int8 stage needs real score units for the rescue cut and the
    returned best score."""
    qc = qc.astype(jnp.float32)
    amax = jnp.max(jnp.abs(qc), axis=(1, 2), keepdims=True)
    s = 127.0 / jnp.maximum(amax, 1e-30)
    return jnp.round(qc * s).astype(jnp.int8), (amax[:, 0, 0] / 127.0)


def screen_geometry(lmax: int, n_songs: int, pad: int, k: int):
    """(R, n_pad) for a screened layout: R a multiple of 8k so the
    pooled region length Rc = R/k satisfies the kernel's sublane-multiple
    constraint; songs rounded to the Pallas song-group size.  One
    definition shared by the single-device engine and the sharded build
    (which forces the GLOBAL geometry onto every shard so one compiled
    program serves all chips)."""
    from pfann_tpu.index.pallas_align import PALLAS_G

    if pad % k != 0:
        raise ValueError(
            "screen_pool_k (%d) must divide the alignment pad (%d) — the "
            "coarse layout's leading-zero invariant needs whole pooled "
            "bins of padding" % (k, pad)
        )
    R = -(-(pad + lmax) // (8 * k)) * (8 * k)
    n_pad = -(-max(n_songs, 1) // PALLAS_G) * PALLAS_G
    return R, n_pad


def build_screen_layout(
    embeddings: np.ndarray,
    counts: np.ndarray,
    *,
    pad: int,
    k: int,
    d: int,
    R: int | None = None,
    n_pad: int | None = None,
    xla_tail: bool = False,
):
    """Uniform-region layout + its overlap-pooled coarse copy.

    Returns (db3 [n_pad, R, d] f32, coarse f32, R, Rc, n_pad).  R/n_pad
    can be forced so several shards share one program (the sharded path
    builds every shard with the global maxima).  xla_tail appends pad//k
    zero rows to the coarse copy for the XLA alignment_core's
    last-region window overhang (the pallas kernel synthesizes the
    halo)."""
    from pfann_tpu.index.align import build_uniform_layout

    lmax = int(counts.max()) if len(counts) else 0
    gR, gn = screen_geometry(lmax, len(counts), pad, k)
    if R is None:
        R = gR
    Rc = R // k
    if n_pad is None:
        n_pad = gn
    if embeddings.size == 0:
        # empty shard / empty DB: all-zero regions (build_uniform_layout
        # collapses to a 0-column layout for empty input)
        db3 = np.zeros((n_pad, R, d), np.float32)
    else:
        db2, _ = build_uniform_layout(
            embeddings, counts, pad=pad, round_r_to=R, pad_songs_to=n_pad,
            trailing_pad=False,
        )
        db3 = db2.reshape(n_pad, R, d)
    # overlap pooling: bin j = rows [jk, jk+2k).  The +1 shifted add
    # crosses region boundaries, which is exact: the next region's
    # first bins pool its leading PAD zeros.
    c1 = db3.reshape(n_pad * Rc, k, d).sum(axis=1)
    coarse = c1.copy()
    coarse[:-1] += c1[1:]
    if xla_tail:
        coarse = np.pad(coarse, ((0, pad // k), (0, 0)))
    return db3, coarse, R, Rc, n_pad


def screen_core(
    db3,
    coarse,
    qpad,
    song_valid,
    *,
    k: int,
    R: int,
    Rc: int,
    S: int,
    n_pad: int,
    M: int,
    backend: str,
    dt,
    impl: str,
    interpret: bool,
    score_alpha: float = 0.0,
    pad: int = 0,
    counts=None,
    q_valid=None,
    with_stats: bool = False,
    exact_scale: float = 1.0,
):
    """The two-stage screened query (trace-time building block, shared
    by the single-device engine and the per-shard body of the sharded
    path).  qpad [B, S, d]; song_valid [n_pad] bool (False = padding
    slot, excluded from the screen).  Returns (cand [B, M] region index,
    best [B, M] exact score sum, argoff [B, M] region offset); with
    with_stats=True appends stats [B, 4] = (coarse winner score, coarse
    M-th score, mean, std over valid songs) — the stage-1 margin
    telemetry the engine logs at query time (the regime guard around the
    documented low-cosine danger zone, see module docstring).

    score_alpha > 0 applies exp(-alpha (1 - ip)^2) per window in the
    exact stage-2 rescore (seqscore.cpp:103-110), masking out-of-song
    windows to 0 via ``counts`` [n_pad] (per-region real row counts) and
    padded query rows via ``q_valid`` [B, S].  Stage 1 keeps ranking on
    raw pooled inner products — the exact analogue of the reference,
    whose faiss candidate generation is ip-based regardless of alpha
    (database.py:121); only the rerank sees the transform.
    """
    if score_alpha != 0.0 and db3.dtype == jnp.int8:
        # the alpha transform needs real inner products per window; the
        # int8 exact stage only recovers score UNITS after the sum
        raise NotImplementedError(
            "score_alpha requires a float exact stage (screen_exact_dtype"
            " != 'int8')"
        )
    Sc = -(-S // k)
    # ---- stage 1: coarse screen over the pooled copy.  Collapse the S
    # query windows onto their Sc coarse diagonals (sum of windows
    # sharing i//k) — full signal, 1/k the filter rows.
    qc = jnp.pad(qpad, ((0, 0), (0, Sc * k - S), (0, 0)))
    qc = qc.reshape(qpad.shape[0], Sc, k, -1).sum(axis=2)
    if coarse.dtype == jnp.int8:
        # int8 coarse path: quantize the collapsed filters per query and
        # rank on raw int32 accumulations (scales cancel within a query)
        qc = quantize_queries_int8(qc)
        sc_dt = jnp.int32
    else:
        sc_dt = dt
    best_c, _ = alignment_core(
        coarse, qc, R=Rc, S=Sc, n_songs=n_pad,
        score_dtype=sc_dt, impl=impl, interpret=interpret,
    )
    best_c = jnp.where(song_valid[None, :], best_c, -jnp.inf)
    if backend == "approx":
        vals_c, cand = jax.lax.approx_max_k(best_c, M, recall_target=0.99)
    else:
        vals_c, cand = jax.lax.top_k(best_c, M)  # [B, M]
    # approx_max_k takes per-bin maxima WITHOUT value filtering, so a
    # bin of all-padding slots can surface a masked index; re-validate
    # the selection (exact top_k never picks -inf while M <= n_real)
    sel_ok = jnp.take(song_valid, cand)  # [B, M]

    stats = None
    if with_stats:
        # margin statistics of the coarse distribution (device-cheap:
        # two masked reductions over the [B, n_pad] scores that already
        # exist).  sigma-normalized winner-vs-cut gap is the documented
        # screen-regime signal; scale-invariant, so valid for the int8
        # coarse path's raw int32 accumulations too.
        ok = song_valid[None, :]
        nv = jnp.maximum(jnp.sum(ok, axis=1).astype(jnp.float32), 1.0)
        safe = jnp.where(ok, best_c, 0.0)
        mu = jnp.sum(safe, axis=1) / nv
        var = jnp.sum(jnp.where(ok, (safe - mu[:, None]) ** 2, 0.0), axis=1) / nv
        stats = jnp.stack(
            [vals_c[:, 0], vals_c[:, -1], mu, jnp.sqrt(var)], axis=1
        )

    # ---- stage 2: exact alignment over the surviving regions.  With an
    # int8 exact layout (the 500k-track HBM regime) the rescore runs the
    # MXU's double-rate int8 path on per-query-quantized filters and the
    # int32 alignment sums are dequantized back to approximate mean-IP
    # units (db_scale * per-query scale) — ranking within a query is
    # scale-invariant, so only the *units* of `best` are approximate
    g = jnp.take(db3, cand, axis=0)  # [B, M, R, d]
    exact_int8 = db3.dtype == jnp.int8
    if exact_int8:
        qq, qscale = quantize_queries_int8_scaled(qpad)
        scores = jnp.einsum(
            "bmrd,bsd->bmrs", g, qq, preferred_element_type=jnp.int32,
        )
        dequant = exact_scale * qscale  # [B]
    else:
        scores = jnp.einsum(
            "bmrd,bsd->bmrs", g, qpad.astype(dt),
            preferred_element_type=dt,
        )
    scores = jnp.pad(scores, ((0, 0), (0, 0), (0, S), (0, 0)))

    if score_alpha != 0.0:
        hi = pad + jnp.take(counts, cand)  # [B, M] first invalid region row

        def slice_contrib(i):
            sl = scores[:, :, i : R + i, i].astype(jnp.float32)
            l2 = 1.0 - sl
            c = jnp.exp(-score_alpha * l2 * l2)
            row = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 2) + i
            c = c * ((row >= pad) & (row < hi[:, :, None]))
            if q_valid is not None:
                c = c * q_valid[:, None, None, i]
            return c
    else:

        def slice_contrib(i):
            return scores[:, :, i : R + i, i].astype(jnp.float32)

    align = slice_contrib(0)
    for i in range(1, S):
        align = align + slice_contrib(i)
    best = jnp.max(align, axis=2)  # [B, M] — RAW units (argmax below
    # compares against align, so dequantization must come after)
    offs = jax.lax.broadcasted_iota(jnp.int32, align.shape, 2)
    argoff = jnp.max(
        jnp.where(align >= best[:, :, None], offs, -1), axis=2
    )
    if exact_int8:
        best = best * dequant[:, None]
    # invalid survivors (possible only via approx_max_k, above) are
    # neutralized with -inf so no downstream argmax ever selects them;
    # consumers that scatter by cand must additionally filter on
    # finite scores (screen.py:search, sharded query_batch's ids >= 0)
    best = jnp.where(sel_ok, best, -jnp.inf)
    if with_stats:
        return cand, best, argoff, stats
    return cand, best, argoff


class ScreenedAlignmentEngine:
    """Drop-in for AlignmentEngine (same search/search_top1_device
    contract) with a coarse screening pass in front of the exact scan.

    Parameters
    ----------
    k : int          time-pooling factor of the coarse copy (region rows
                     summed k-at-a-time; query windows taken every k-th)
    top_m : int      songs surviving the screen, per query
    backend : str    'exact' | 'approx' | 'auto' — top-M selection op
                     (lax.top_k vs the TPU-optimized approx_max_k)
    coarse_dtype :   stage-1 matmul dtype ('int8' | 'bf16' | 'f32' |
                     None = score_dtype).  int8 halves coarse HBM
                     traffic and runs the MXU's double-rate int8 path;
                     stage 2 always rescores survivors exactly, so only
                     the top-M *cut* sees the quantization noise.
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        counts: np.ndarray,
        pad: int = DEFAULT_PAD,
        k: int = 4,
        top_m: int = 32,
        score_dtype=jnp.bfloat16,
        coarse_dtype=None,
        device=None,
        impl: str = "auto",
        backend: str = "auto",
        interpret: bool = False,
        score_alpha: float = 0.0,
        rescue_threshold: float | None = None,
        exact_dtype=None,
    ):
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from pfann_tpu.index.pallas_align import HALO

            if -(-pad // k) > HALO:
                # coarse filters have ceil(S/k) <= ceil(pad/k) windows;
                # beyond the kernel's halo the coarse stage must run XLA
                impl = "xla"
        if backend == "auto":
            backend = "approx" if jax.default_backend() == "tpu" else "exact"
        self.impl = impl
        self.backend = backend
        self.interpret = interpret
        self.k = k
        self.pad = pad
        self.n_songs = len(counts)
        self.top_m = min(top_m, self.n_songs)
        self.d = embeddings.shape[1] if embeddings.size else 128
        self.score_dtype = score_dtype
        self.score_alpha = float(score_alpha)

        from pfann_tpu.index.pallas_align import LANE_B, PALLAS_G

        self.max_batch = LANE_B if impl == "pallas" else 128

        db3, coarse, self.R, self.Rc, n_pad = build_screen_layout(
            embeddings, counts, pad=pad, k=k, d=self.d,
            xla_tail=(impl != "pallas"),
        )
        self.n_pad = n_pad
        from pfann_tpu.utils.fastcast import host_cast

        self.coarse_dtype = coarse_dtype_of(coarse_dtype, score_dtype)
        # exact-stage storage dtype: int8 quarters the resident layout vs
        # f32 (the 500k-track-on-one-chip regime: ~6 GB at R~96, d=128 —
        # bf16 would need ~12 GB plus workspace and not fit v5e HBM).
        # Stage 2 + rescue then rank on int32 accumulations (per-query
        # scales cancel within a query) and the WINNER's score is
        # re-computed in f32 from the host embedding matrix — the
        # "exact stage int8, f32 rescore of the top-1 region" design.
        self.exact_int8 = exact_dtype in ("int8", jnp.int8)
        self._db3_scale = 1.0
        self._emb_host = self._counts_host = self._song_pos_host = None
        if self.exact_int8:
            if self.score_alpha != 0.0:
                raise ValueError(
                    "score_alpha requires a float exact stage "
                    "(screen_exact_dtype != 'int8')"
                )
            amax = float(np.abs(db3).max()) if db3.size else 0.0
            amax = amax or 1.0
            self._db3_scale = amax / 127.0
            # in-place quantize (db3 is a fresh build_screen_layout
            # output; avoids a second multi-GB f32 temporary at scale)
            np.multiply(db3, 127.0 / amax, out=db3)
            np.rint(db3, out=db3)
            np.clip(db3, -127, 127, out=db3)
            self._db3 = jax.device_put(jnp.asarray(db3.astype(np.int8)),
                                       device)
            # host-side f32 references for the winner rescore (no copy —
            # the caller's embedding matrix)
            self._emb_host = embeddings
            self._counts_host = np.asarray(counts, np.int64)
            self._song_pos_host = np.pad(
                np.cumsum(self._counts_host), (1, 0)
            )
        else:
            self._db3 = jax.device_put(
                jnp.asarray(host_cast(db3, score_dtype)), device
            )
        if self.coarse_dtype == jnp.int8:
            coarse = quantize_coarse_int8(coarse)
        else:
            coarse = host_cast(coarse, self.coarse_dtype)
        self._coarse = jax.device_put(jnp.asarray(coarse), device)
        self._song_valid = jax.device_put(
            jnp.asarray(np.arange(n_pad) < self.n_songs), device
        )
        self._counts = None
        if self.score_alpha != 0.0:
            # per-region real row counts: the alpha path's out-of-song
            # window mask in stage 2
            cpad = np.zeros(n_pad, np.int32)
            cpad[: self.n_songs] = np.asarray(counts, np.int32)
            self._counts = jax.device_put(jnp.asarray(cpad), device)
        # Exhaustive-rescue stage (stage 3): a query whose best EXACT
        # survivor score lands below this mean-IP threshold is rescored
        # against the FULL layout (self._db3 — already resident for
        # stage 2, so rescue costs no extra HBM).  A low best-exact score
        # is precisely the signature of a stage-1 prune that dropped the
        # true song: measured on the 20k-track family corpus, every
        # screen-vs-exhaustive answer disagreement at every SNR in -6..8
        # scored below 0.35 while true alignments score >= ~0.45
        # (ACCURACY_r04.md), so the fixed default recovers exhaustive
        # answers exactly, at 8-40% escalation depending on noise.
        # None/0 disables.  With score_alpha the cut is mapped through
        # the per-window exp transform — an APPROXIMATION of the mean-IP
        # cut (the monotone transform does not commute with the mean
        # over windows); rescue parity was validated at alpha=0, and the
        # alpha path's tau should be calibrated separately if exactness
        # matters there.
        self.rescue_threshold = rescue_threshold or None
        self._rescue_tau = None
        if self.rescue_threshold is not None:
            t = float(self.rescue_threshold)
            self._rescue_tau = (
                float(np.exp(-self.score_alpha * (1.0 - t) ** 2))
                if self.score_alpha != 0.0 else t
            )
        self._row_valid = None
        if self.score_alpha != 0.0 and self.rescue_threshold is not None:
            from pfann_tpu.index.align import build_row_valid

            self._row_valid = jax.device_put(
                jnp.asarray(build_row_valid(
                    # + pad: matches the trailing zero rows _rescue_fn
                    # appends for the XLA core's shifted slices
                    np.asarray(counts), self.R, pad, n_pad * self.R + pad
                )),
                device,
            )
        self._fns: dict = {}

    def max_query_windows(self) -> int:
        return self.pad

    # ------------------------------------------------------------------
    def _query_fn(self, S: int, with_stats: bool = False):
        """Jitted two-stage query for a window-count bucket: returns per
        query the M surviving (global song id, exact best score sum,
        exact best region offset) [+ stage-1 margin stats]."""
        key = (S, with_stats)
        if key in self._fns:
            return self._fns[key]
        core = functools.partial(
            screen_core,
            k=self.k, R=self.R, Rc=self.Rc, S=S, n_pad=self.n_pad,
            M=self.top_m, backend=self.backend, dt=self.score_dtype,
            impl=self.impl, interpret=self.interpret,
            score_alpha=self.score_alpha, pad=self.pad,
            with_stats=with_stats, exact_scale=self._db3_scale,
        )

        @jax.jit
        def fn(db3, coarse, qpad, song_valid, counts, q_valid):
            return core(
                db3, coarse, qpad, song_valid, counts=counts, q_valid=q_valid
            )

        self._fns[key] = fn
        return fn

    # HBM ceiling for the stage-2 workspace (gathered regions [B, M, R, d]
    # + score tensor [B, M, R+S, S]); long queries shrink the dispatch
    # batch instead of OOMing
    STAGE2_BYTES_CAP = 4 << 30

    def _chunk_for(self, S: int) -> int:
        itemsize = (1 if self.exact_int8
                    else 2 if self.score_dtype == jnp.bfloat16 else 4)
        # int8 gathers are 1 B/elem but the int32 score tensor is 4
        per_b = self.top_m * (
            self.R * self.d * itemsize
            + (self.R + S) * S * (4 if self.exact_int8 else itemsize)
        )
        cap = max(1, self.STAGE2_BYTES_CAP // max(per_b, 1))
        if self.impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE

            cap = max(LANE, cap // LANE * LANE)  # kernel needs LANE multiples
        return max(1, min(self.max_batch, cap))

    def _dispatch(self, filters, sub_lens=None, with_stats=False):
        """Chunk over max_batch (padding the tail chunk) WITHOUT host
        syncs; returns a list of (cand, best, argoff[, stats]) device
        tuples.  ``filters`` may be a host array or an already-staged
        device array (the serving path keeps queries on-accelerator; full
        chunks pass through untouched).  ``sub_lens`` [B] is only
        consulted by the alpha scoring path (zero filter rows must
        contribute 0, not exp(-alpha))."""
        B, S, _ = filters.shape
        fn = self._query_fn(S, with_stats)
        mb = self._chunk_for(S)
        outs = []
        for i in range(0, B, mb):
            chunk = filters[i : i + mb]
            n = chunk.shape[0]
            if n < mb:
                arr = np.asarray(chunk)  # tail: host pad, dtype preserved
                chunk = np.concatenate(
                    [arr,
                     np.zeros((mb - n, S, self.d),
                              arr.dtype)]
                )
            q_valid = None
            if self.score_alpha != 0.0:
                if sub_lens is None:
                    lens = np.full(n, S, np.int32)
                else:
                    lens = np.asarray(sub_lens[i : i + n])
                lens = np.pad(lens, (0, mb - n))
                q_valid = jnp.asarray(
                    (np.arange(S)[None, :] < lens[:, None]).astype(np.float32)
                )
            outs.append(
                fn(self._db3, self._coarse, jnp.asarray(chunk),
                   self._song_valid, self._counts, q_valid)
            )
        return outs

    def search_device(self, filters):
        return self._dispatch(filters)

    def search_top1_device(self, qpad, sub_lens=None, rescued=True):
        """Serving fast path mirroring AlignmentEngine.search_top1_device:
        per chunk a (song [B], score_sum [B], t [B]) device triple — song
        ids are GLOBAL (the candidate map is applied on device).

        With ``rescued`` (default) and a rescue threshold configured, the
        triples are STAGE-3-RESCUED answers whenever the fused one-program
        path is available (:meth:`_fused_ok`): the escalation gate and the
        whole-batch exhaustive rescore run inside the same jitted program
        behind a ``lax.cond``, so pipelined serving dispatch never syncs
        to the host to decide escalation — clean traffic runs at the bare
        stage-1+2 speed and the answers still match ``search()``'s (the
        reference's query API always returns the correct best answer,
        /root/reference/database.py:111-115).  ``rescued=False`` forces
        the bare stages-1+2 triples (benchmark control)."""
        if rescued and self._fused_ok(qpad.shape[1]):
            return self._fused_top1_dispatch(qpad, sub_lens)
        pad = self.pad
        outs = []
        for cand, best, argoff in self._dispatch(qpad):
            m = jnp.argmax(best, axis=1)
            take = jax.vmap(lambda c, b, o, i: (c[i], b[i], o[i]))(
                cand, best, argoff, m
            )
            outs.append(
                (take[0].astype(jnp.int32), take[1],
                 (take[2] - pad).astype(jnp.float32))
            )
        return outs

    # rescue dispatch width: one compiled shape for the exhaustive
    # rescore of escalated queries (LANE multiple for the Pallas kernel)
    RESCUE_CHUNK = 128

    def _rescue_fn(self, S: int):
        """Jitted FULL-layout alignment over the resident stage-2 regions
        (db3 flattened is exactly a uniform alignment layout: R-row
        regions, n_pad songs) — the exhaustive engine's math without a
        second copy of the database."""
        key = ("rescue", S)
        if key in self._fns:
            return self._fns[key]
        impl = ("xla" if self.score_alpha != 0.0 or self.exact_int8
                else self.impl)
        pad = self.pad
        exact_int8, dscale = self.exact_int8, self._db3_scale

        @jax.jit
        def fn(db3, qpad, row_valid, q_valid):
            db = db3.reshape(-1, db3.shape[-1])
            if impl == "xla":
                # the XLA core's shifted slices read S-1 rows past the
                # last region; db3 has no trailing pad (the Pallas kernel
                # synthesizes its halo instead)
                db = jnp.pad(db, ((0, pad), (0, 0)))
            if exact_int8:
                # int8 x int8 -> int32 full-layout rescore, dequantized
                # back to approximate mean-IP units per query
                qq, qscale = quantize_queries_int8_scaled(qpad)
                best, argoff = alignment_core(
                    db, qq,
                    R=self.R, S=S, n_songs=self.n_pad,
                    score_dtype=jnp.int32, impl=impl,
                    interpret=self.interpret,
                )
                return best * (dscale * qscale)[:, None], argoff
            return alignment_core(
                db, qpad,
                R=self.R, S=S, n_songs=self.n_pad,
                score_dtype=self.score_dtype, impl=impl,
                interpret=self.interpret,
                score_alpha=self.score_alpha,
                row_valid=row_valid, q_valid=q_valid,
            )

        self._fns[key] = fn
        return fn

    def _rescue_chunk(self, S: int) -> int:
        """Rescue dispatch width: memory guard mirroring
        AlignmentEngine.SCORE_BYTES_CAP for the XLA impl's materialized
        [N, S, B] score tensor."""
        mb = self.RESCUE_CHUNK
        from pfann_tpu.index.pallas_align import HALO

        if (self.impl != "pallas" or self.score_alpha != 0.0
                or self.exact_int8 or S > HALO + 1):
            # S > HALO+1: alignment_core silently falls back from the
            # fused kernel to XLA for queries beyond the Pallas halo
            # (60 s = 119 windows), so the XLA score-tensor cap must
            # apply there too — without it a 128-wide rescue is a
            # [N, S, B] bf16 tensor of ~316 GB (measured OOM)
            # int8 rescue runs XLA and materializes int32 scores (4 B)
            itemsize = (4 if self.exact_int8
                        else 2 if self.score_dtype == jnp.bfloat16 else 4)
            per_b = self.n_pad * self.R * S * itemsize
            mb = max(1, min(mb, (4 << 30) // max(per_b, 1)))
        return mb

    def _fused_ok(self, S: int) -> bool:
        """True when the rescued top-1 can run as ONE jitted program per
        dispatch chunk, with the stage-3 rescue behind a device-side
        ``lax.cond`` (no host gate, no pipeline stall).  Requires the
        whole-chunk full-layout rescore to be affordable: always for the
        fused Pallas kernel (VMEM-streamed), and for the XLA fallback
        only while the materialized [N, S, chunk] score tensor fits the
        4 GiB cap.  alpha / int8-exact keep the host-gated path (their
        rescue math needs per-query masks / f32 winner rescore on
        host)."""
        if (self._rescue_tau is None or not self.n_songs
                or self.score_alpha != 0.0 or self.exact_int8):
            return False
        from pfann_tpu.index.pallas_align import HALO

        if self.impl == "pallas" and S <= HALO + 1:
            return True
        itemsize = 2 if self.score_dtype == jnp.bfloat16 else 4
        per_b = self.n_pad * self.R * S * itemsize
        return per_b * self._chunk_for(S) <= (4 << 30)

    def _top1_fused_fn(self, S: int):
        """Jitted stages 1+2 -> top-1 -> lax.cond(any below tau) ->
        whole-chunk full-layout rescue -> per-row merge.  Clean chunks
        never execute the rescue branch; escalating chunks pay ONE
        exhaustive alignment over the resident layout (the same kernel
        and shape as the exhaustive engine's headline dispatch) instead
        of a host round trip + serialized sub-batch rescore."""
        key = ("fused_top1", S)
        if key in self._fns:
            return self._fns[key]
        core = functools.partial(
            screen_core,
            k=self.k, R=self.R, Rc=self.Rc, S=S, n_pad=self.n_pad,
            M=self.top_m, backend=self.backend, dt=self.score_dtype,
            impl=self.impl, interpret=self.interpret,
            score_alpha=0.0, pad=self.pad, exact_scale=self._db3_scale,
        )
        pad, R = self.pad, self.R
        n_songs, n_pad = self.n_songs, self.n_pad
        impl, interpret = self.impl, self.interpret
        dt = self.score_dtype
        tau = float(self._rescue_tau)

        @jax.jit
        def fn(db3, coarse, qpad, song_valid, counts, q_lens):
            cand, best, argoff = core(
                db3, coarse, qpad, song_valid, counts=counts, q_valid=None
            )
            m = jnp.argmax(best, axis=1)
            take = jax.vmap(lambda c, b, o, i: (c[i], b[i], o[i]))(
                cand, best, argoff, m
            )
            song2 = take[0].astype(jnp.int32)
            sco2 = take[1].astype(jnp.float32)
            off2 = (take[2] - pad).astype(jnp.float32)
            lens = q_lens.astype(jnp.float32)
            # same escalation criterion as search()/search_top1's host
            # gate: best exact MEAN score below tau (zero-length padding
            # rows never escalate)
            need = (sco2 / jnp.maximum(lens, 1.0) < tau) & (lens > 0)

            def rescue(qp):
                db = db3.reshape(-1, db3.shape[-1])
                # alignment_core zero-extends tail-less Pallas layouts
                # itself when it falls back to the XLA slices
                b, o = alignment_core(
                    db, qp, R=R, S=S, n_songs=n_pad, score_dtype=dt,
                    impl=impl, interpret=interpret,
                )
                b = jnp.where(
                    jnp.arange(n_pad)[None, :] < n_songs, b, -jnp.inf
                )
                s = jnp.argmax(b, axis=1)
                tk = jax.vmap(lambda bb, oo, ss: (bb[ss], oo[ss]))(b, o, s)
                return (
                    s.astype(jnp.int32),
                    tk[0].astype(jnp.float32),
                    (tk[1] - pad).astype(jnp.float32),
                )

            def skip(qp):
                return song2, sco2, off2

            sR, bR, oR = jax.lax.cond(jnp.any(need), rescue, skip, qpad)
            # per-row merge keeps exact search() parity: above-tau rows
            # keep their trusted stage-2 answer even when a chunk-mate
            # triggered the rescue branch
            return (
                jnp.where(need, sR, song2),
                jnp.where(need, bR, sco2),
                jnp.where(need, oR, off2),
            )

        self._fns[key] = fn
        return fn

    def _fused_top1_dispatch(self, qpad, sub_lens=None):
        """Chunked dispatch of :meth:`_top1_fused_fn` — the rescued
        serving fast path.  Returns a list of (song, score_sum, t)
        device triples (same contract as the bare path); no host syncs
        inside, so callers can pipeline dispatches."""
        B, S, _ = qpad.shape
        fn = self._top1_fused_fn(S)
        mb = self._chunk_for(S)
        lkey = ("fused_lens", S, mb)
        if lkey not in self._fns:  # device-resident full-length lens row
            self._fns[lkey] = jnp.full((mb,), S, jnp.int32)
        outs = []
        for i in range(0, B, mb):
            chunk = qpad[i : i + mb]
            n = chunk.shape[0]
            if n < mb:
                arr = np.asarray(chunk)
                chunk = np.concatenate(
                    [arr, np.zeros((mb - n, S, self.d), arr.dtype)]
                )
            if sub_lens is None and n == mb:
                lens = self._fns[lkey]
            else:
                hl = (np.full(n, S, np.int32) if sub_lens is None
                      else np.asarray(sub_lens[i : i + n], np.int32))
                lens = jnp.asarray(np.pad(hl, (0, mb - n)))
            outs.append(
                fn(self._db3, self._coarse, jnp.asarray(chunk),
                   self._song_valid, self._counts, lens)
            )
        return outs

    def _rescue(self, filters, sub_lens, esc: np.ndarray):
        """Exhaustively rescore the escalated queries (rows ``esc`` of
        ``filters``); returns (best [len(esc), n_songs] summed score,
        argoff [len(esc), n_songs])."""
        S = filters.shape[1]
        fn = self._rescue_fn(S)
        mb = self._rescue_chunk(S)
        bests, offs = [], []
        for i in range(0, len(esc), mb):
            take = esc[i : i + mb]
            chunk = np.zeros((mb, S, self.d), np.float32)
            chunk[: len(take)] = np.asarray(filters)[take]
            q_valid = None
            if self.score_alpha != 0.0:
                lens = np.zeros(mb, np.int32)
                lens[: len(take)] = np.asarray(sub_lens)[take]
                q_valid = jnp.asarray(
                    (np.arange(S)[:, None] < lens[None, :]).astype(np.float32)
                )
            b, o = fn(self._db3, jnp.asarray(chunk), self._row_valid, q_valid)
            bests.append(np.asarray(b)[: len(take), : self.n_songs])
            offs.append(np.asarray(o)[: len(take), : self.n_songs])
        return np.concatenate(bests), np.concatenate(offs)

    def _f32_rescore_winners(
        self, filters, sub_lens, songs, ts
    ) -> np.ndarray:
        """f32 rescore of the top-1 region only (the int8 exact stage's
        final step): recompute each query's WINNER alignment score sum
        from the host f32 embedding matrix at the already-decided
        (song, offset).  B x S x d MACs on host — micro-work next to the
        device stages; answers/offsets are untouched, only the reported
        score returns to exact f32 units."""
        f = np.asarray(filters, dtype=np.float32)
        out = np.zeros(len(songs), np.float32)
        emb, sp = self._emb_host, self._song_pos_host
        for b in range(len(songs)):
            s = int(songs[b])
            if s < 0 or s >= len(self._counts_host):
                continue
            off = int(ts[b])
            n = int(sub_lens[b]) if sub_lens is not None else f.shape[1]
            cnt = int(self._counts_host[s])
            i0, i1 = max(0, -off), min(n, cnt - off)
            if i1 > i0:
                rows = emb[sp[s] + off + i0 : sp[s] + off + i1]
                out[b] = float(np.sum(rows * f[b, i0:i1]))
        return out

    def _top1_finalize_fn(self):
        """Jitted (best [B, n_pad], argoff [B, n_pad]) -> top-1 triple
        (song int32, score_sum f32, t f32); padding slots masked out so
        the full [B, n_pad] rescue table never leaves the device."""
        key = "rescue_top1_fin"
        if key in self._fns:
            return self._fns[key]
        n_songs, pad = self.n_songs, self.pad

        @jax.jit
        def fin(best, argoff):
            best = jnp.where(
                jnp.arange(best.shape[1])[None, :] < n_songs, best, -jnp.inf
            )
            song = jnp.argmax(best, axis=1)
            take = jax.vmap(lambda b, o, s: (b[s], o[s]))(best, argoff, song)
            return (
                song.astype(jnp.int32),
                take[0].astype(jnp.float32),
                (take[1] - pad).astype(jnp.float32),
            )

        self._fns[key] = fin
        return fin

    def rescue_top1_device(self, filters, esc: np.ndarray, sub_lens=None):
        """Stage-3 rescue for the SERVING path: exhaustively rescore the
        escalated rows ``esc`` of ``filters`` against the full resident
        layout and finalize top-1 ON DEVICE — only [chunk]-sized triples
        ever cross to the host, never a [B, n_songs] table.  Returns a
        list of (song, score_sum, t) device triples whose concatenation
        covers >= len(esc) rows (callers slice to len(esc))."""
        S = filters.shape[1]
        fn = self._rescue_fn(S)
        fin = self._top1_finalize_fn()
        mb = self._rescue_chunk(S)
        fdev = jnp.asarray(filters)  # no-op for device-resident queries
        outs = []
        for i in range(0, len(esc), mb):
            take = np.asarray(esc[i : i + mb], dtype=np.int64)
            idx = np.zeros(mb, np.int64)
            idx[: len(take)] = take  # tail pads re-score row 0 (sliced off)
            chunk = jnp.take(fdev, jnp.asarray(idx), axis=0)
            q_valid = None
            if self.score_alpha != 0.0:
                lens = np.zeros(mb, np.int32)
                lens[: len(take)] = (
                    np.full(len(take), S, np.int32) if sub_lens is None
                    else np.asarray(sub_lens)[take]
                )
                q_valid = jnp.asarray(
                    (np.arange(S)[:, None] < lens[None, :]).astype(np.float32)
                )
            b, o = fn(self._db3, chunk, self._row_valid, q_valid)
            outs.append(fin(b, o))
        return outs

    def search_top1(self, qpad, sub_lens=None):
        """RESCUED top-1 serving: the fast stages 1+2 answer every query,
        then queries whose best exact score falls below the rescue cut
        are exhaustively rescored (stage 3) with an on-device top-1
        finalize — so the returned answers equal ``search()``'s (and
        hence the exhaustive engine's) even in the winner-dropping
        regime, while the D2H stays [B]-sized.  Returns host
        (song [B] int32, score_sum [B] f32, t [B] f32).  sub_lens
        defaults to S (full-length serving queries).

        When the fused one-program path is available the rescue already
        happened on device (:meth:`search_top1_device`) and this is just
        a sync; otherwise the escalation set is gated on host and
        rescored via :meth:`rescue_top1_device` (alpha / int8-exact /
        beyond-cap layouts)."""
        B, S, _ = qpad.shape
        if self._fused_ok(S):
            outs = self._fused_top1_dispatch(qpad, sub_lens)
            song = np.concatenate([np.asarray(o[0]) for o in outs])[:B]
            best = np.concatenate(
                [np.asarray(o[1]) for o in outs]
            )[:B].astype(np.float32)
            t = np.concatenate([np.asarray(o[2]) for o in outs])[:B]
            return song, best, t
        outs = self.search_top1_device(qpad, rescued=False)
        song = np.concatenate([np.asarray(o[0]) for o in outs])[:B]
        best = np.concatenate([np.asarray(o[1]) for o in outs])[:B]
        t = np.concatenate([np.asarray(o[2]) for o in outs])[:B]
        best = best.astype(np.float32)
        lens = (
            np.full(B, S, np.int32) if sub_lens is None
            else np.asarray(sub_lens)
        )
        if self._rescue_tau is None or not self.n_songs:
            if self.exact_int8:
                best = self._f32_rescore_winners(qpad, lens, song, t)
            return song, best, t
        mean = best / np.maximum(lens, 1)
        esc = np.nonzero((mean < self._rescue_tau) & (lens > 0))[0]
        if len(esc):
            from pfann_tpu.utils.logging import get_logger

            get_logger().info(
                "screen top-1 rescue: %d/%d queries below tau=%.3f "
                "rescored exhaustively", len(esc), B, self._rescue_tau,
            )
            triples = self.rescue_top1_device(qpad, esc, sub_lens=lens)
            rs = np.concatenate([np.asarray(tr[0]) for tr in triples])
            rb = np.concatenate([np.asarray(tr[1]) for tr in triples])
            rt = np.concatenate([np.asarray(tr[2]) for tr in triples])
            song = np.array(song, copy=True)
            song[esc] = rs[: len(esc)]
            best[esc] = rb[: len(esc)]
            t = np.array(t, copy=True)
            t[esc] = rt[: len(esc)]
        if self.exact_int8:
            best = self._f32_rescore_winners(qpad, lens, song, t)
        return song, best, t

    # sigma-normalized coarse winner-vs-cut gap below which a query is
    # "close to the cut" (the screen's documented low-margin regime), and
    # the batch fraction of close queries that triggers the warning
    MARGIN_SIGMA = 1.0
    MARGIN_WARN_FRAC = 0.2

    def _log_stats(self, stats: np.ndarray) -> None:
        """Stage-1 margin telemetry (VERDICT r3 weak #3): one log line per
        search batch; a WARNING when the coarse margin distribution
        approaches the documented danger zone (module docstring: at
        per-window cosine ~0.19 the winner fell outside the survivor set
        18% of the time — exactly when winner-vs-cut gaps collapse into
        the coarse noise floor)."""
        from pfann_tpu.utils.logging import get_logger

        v1, vm, _, sigma = stats.T
        gap = (v1 - vm) / np.maximum(sigma, 1e-30)
        p10, p50 = np.percentile(gap, [10, 50])
        frac = float(np.mean(gap < self.MARGIN_SIGMA))
        logger = get_logger()
        logger.info(
            "screen stage-1 margin: winner-vs-cut gap p50 %.1f sigma, "
            "p10 %.1f sigma, %.0f%% of queries within %.1f sigma",
            p50, p10, 100.0 * frac, self.MARGIN_SIGMA,
        )
        if frac > self.MARGIN_WARN_FRAC:
            logger.warning(
                "screen margin danger zone: %.0f%% of queries scored "
                "within %.1f sigma of the stage-1 cut — the coarse prune "
                "may be dropping true winners (index/screen.py regime "
                "note); raise screen_top_m / lower screen_pool_k, or use "
                "engine='align'",
                100.0 * frac, self.MARGIN_SIGMA,
            )

    def search(
        self, filters: np.ndarray, sub_lens: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """AlignmentEngine.search contract: ([B, n_songs] mean-score,
        [B, n_songs] offset) tables.  Unscreened songs keep score 0 /
        time 0 — the reference's untouched-candidate convention
        (matcher .bin rows only carry rerank results for candidates,
        database.py:142-163)."""
        B = filters.shape[0]
        song_score = np.zeros((B, self.n_songs), dtype=np.float32)
        song_t = np.zeros((B, self.n_songs), dtype=np.float32)
        at = 0
        all_stats = []
        for cand, best, argoff, stats in self._dispatch(
            filters, sub_lens, with_stats=True
        ):
            cand = np.asarray(cand)
            best = np.asarray(best)
            argoff = np.asarray(argoff)
            n = min(cand.shape[0], B - at)
            all_stats.append(np.asarray(stats)[:n])
            # approx_max_k survivors can include padding slots (cand >=
            # n_songs, best = -inf) — exclude them from the scatter
            ok = np.isfinite(best[:n]) & (cand[:n] < self.n_songs)
            rows = np.broadcast_to(
                np.arange(at, at + n)[:, None], ok.shape
            )
            song_score[rows[ok], cand[:n][ok]] = (
                best[:n] / np.maximum(sub_lens[at : at + n], 1)[:, None]
            )[ok]
            song_t[rows[ok], cand[:n][ok]] = (argoff[:n] - self.pad)[ok]
            at += n
        if all_stats:
            self._log_stats(np.concatenate(all_stats))
        if self._rescue_tau is not None and self.n_songs:
            # stage 3: exhaustive rescue of low-confidence queries.  The
            # per-query best EXACT score separates "screen found the true
            # alignment" from "the coarse cut dropped it" (see __init__
            # note); escalated rows get the full-table exhaustive result,
            # making their answers identical to the align engine's.
            best_mean = song_score.max(axis=1)
            esc = np.nonzero(
                (best_mean < self._rescue_tau) & (np.asarray(sub_lens) > 0)
            )[0]
            if len(esc):
                from pfann_tpu.utils.logging import get_logger

                get_logger().info(
                    "screen rescue: %d/%d queries below tau=%.3f rescored "
                    "exhaustively", len(esc), B, self._rescue_tau,
                )
                rb, ro = self._rescue(filters, sub_lens, esc)
                song_score[esc] = rb / np.maximum(
                    np.asarray(sub_lens)[esc, None], 1
                )
                song_t[esc] = ro - self.pad
        if self.exact_int8 and self.n_songs:
            # f32 rescore of each query's winner entry (non-winner table
            # entries keep dequantized-approximate units, documented)
            bi = np.arange(B)
            win = np.argmax(song_score, axis=1)
            rescored = self._f32_rescore_winners(
                filters, sub_lens, win, song_t[bi, win]
            )
            song_score[bi, win] = rescored / np.maximum(
                np.asarray(sub_lens), 1
            )
        return song_score, song_t
