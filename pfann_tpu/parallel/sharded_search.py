"""ICI-sharded fingerprint retrieval.

Scale-out replacement for the single-device engine in
pfann_tpu/index/search.py: the song set is partitioned into per-chip
shards (balanced by segment count), each chip runs MIPS top-k + sequence
rerank over *its own* songs entirely locally, and only the tiny per-song
(score, time) tables are all_gathered at the end — one collective of
O(n_songs) floats per query batch, riding ICI.

Semantics vs the reference (database.py:117-163): the reference takes a
single global top-k; here each shard takes top-k over its slice, so the
candidate set is a superset of the reference's and per-song scores are
exact alignment scores either way — retrieval recall can only improve.

Sharding by song (not by raw row) keeps every rerank window local to one
chip, so there is no cross-chip gather in the hot path at all.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfann_tpu.index.search import (
    bucket_batch,
    bucket_windows,
    mips_topk,
    seq_rerank,
)
from pfann_tpu.utils.fastcast import host_cast


def partition_songs(counts: np.ndarray, n_shards: int) -> list[list[int]]:
    """Greedy balanced partition of songs into n_shards by segment count,
    preserving song order inside a shard (contiguity is irrelevant — each
    shard re-packs its songs)."""
    order = np.argsort(-counts, kind="stable")
    loads = np.zeros(n_shards, dtype=np.int64)
    groups: list[list[int]] = [[] for _ in range(n_shards)]
    for song in order:
        s = int(np.argmin(loads))
        groups[s].append(int(song))
        loads[s] += int(counts[song])
    return [sorted(g) for g in groups]


def gather_shard_rows(
    embeddings: np.ndarray, song_pos: np.ndarray, counts: np.ndarray,
    ga, d: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ragged gather of one shard's songs' embedding rows:
    returns (rows [counts[ga].sum(), d], counts[ga]).  Output row i is
    embeddings[starts_rep[i] + intra-song offset] — no per-song Python
    slicing, which is minutes of build latency at the 100k-track scale
    (same idiom as index/align.py build_uniform_layout)."""
    ga = np.asarray(ga, dtype=np.int64)
    if not len(ga):
        return np.zeros((0, d), np.float32), np.zeros(0, np.int64)
    loc_counts = np.asarray(counts, dtype=np.int64)[ga]
    starts = song_pos[ga]
    ends = np.cumsum(loc_counts)
    idx = (
        np.repeat(starts, loc_counts)
        + np.arange(int(ends[-1]), dtype=np.int64)
        - np.repeat(ends - loc_counts, loc_counts)
    )
    return embeddings[idx], loc_counts


class ShardedDatabase:
    """Device-mesh resident database.

    Host-side construction re-packs the flat embedding file into per-shard
    arrays padded to a common size:
      db_sh       [n_shards, rows_max, d]
      song_pos_sh [n_shards, songs_max + 1]   (cumsum; zero-length padding
                                               songs collapse onto the end)
      song_map    [n_shards, songs_max]       (global song id, -1 = pad)
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        counts: np.ndarray,
        mesh: Mesh,
        axis: str = "db",
        top_k: int = 100,
        frame_shift_mul: int = 1,
        score_alpha: float = 0.0,
        backend: str = "exact",
        db_dtype=jnp.bfloat16,
        engine: str = "topk",
        align_pad: int = 32,
        impl: str = "auto",
        interpret: bool = False,
        screen_k: int = 4,
        screen_top_m: int = 32,
        screen_coarse_dtype=None,
        screen_rescue: float | None = None,
    ):
        self.mesh = mesh
        self.axis = axis
        self.pad = align_pad
        self.top_k = top_k
        self.frame_shift_mul = frame_shift_mul
        self.score_alpha = float(score_alpha)
        if backend == "auto":
            backend = "approx" if jax.default_backend() == "tpu" else "exact"
        self.backend = backend
        self.engine = engine
        # stage-3 exhaustive rescue cut for the screen engine (same
        # mean-IP semantics and default as ScreenedAlignmentEngine: a
        # query whose best exact survivor MEAN score lands below this is
        # rescored against the full per-shard layouts).  With
        # score_alpha the cut is mapped through the per-window exp
        # transform — an approximation of the mean-IP cut (the monotone
        # transform does not commute with the mean; same caveat as
        # ScreenedAlignmentEngine)
        self.rescue_tau = None
        if engine == "screen" and screen_rescue:
            t = float(screen_rescue)
            self.rescue_tau = (
                float(np.exp(-self.score_alpha * (1.0 - t) ** 2))
                if self.score_alpha != 0.0 else t
            )
        # align-engine kernel choice: the fused Pallas kernel on TPU (the
        # round-1 single-chip headline path — the XLA variant is ~4x
        # slower at serving batch sizes), XLA elsewhere.  interpret=True
        # runs the pallas layout through the interpreter for CPU parity
        # tests.
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if self.score_alpha != 0.0 and engine == "align":
            # the fused Pallas kernel accumulates window dots without
            # materializing them; the alpha transform needs the
            # per-window slices (same forcing as AlignmentEngine).  The
            # screen engine keeps its impl — its stage 1 ranks raw
            # pooled IPs in any impl and stage 2/rescue handle alpha.
            impl = "xla"
        self.impl = impl
        self.interpret = interpret
        n_shards = mesh.shape[axis]
        self.n_shards = n_shards
        self.n_songs = len(counts)
        self.d = embeddings.shape[1] if embeddings.size else 128

        song_pos = np.pad(np.cumsum(counts, dtype=np.int64), (1, 0))
        groups = partition_songs(np.asarray(counts), n_shards)
        songs_max = max((len(g) for g in groups), default=0)
        shard = NamedSharding(mesh, P(axis))

        if engine == "screen":
            # per-shard two-stage screened retrieval (index/screen.py):
            # each chip screens ITS songs with the pooled coarse copy and
            # rescores its local top-M exactly — the union over shards is
            # a superset of the global top-M, so recall vs the
            # single-device screened engine can only improve.  Common
            # R/n_pad across shards -> one compiled program per chip.
            from pfann_tpu.index.screen import (
                build_screen_layout,
                coarse_dtype_of,
                quantize_coarse_int8,
                screen_geometry,
            )

            self.screen_k = screen_k
            lmax = int(counts.max()) if len(counts) else 0
            # GLOBAL geometry forced onto every shard -> one program
            R, n_pad = screen_geometry(lmax, songs_max, align_pad, screen_k)
            self.R = R
            songs_max = n_pad
            self.top_m = min(screen_top_m, songs_max)
            db3_sh, coarse_sh, valid_sh = [], [], []
            counts_sh_l, rv_sh_l = [], []
            song_map = np.full((n_shards, songs_max), -1, dtype=np.int32)
            counts_np = np.asarray(counts, dtype=np.int64)
            for si, g in enumerate(groups):
                loc_emb, loc_counts = gather_shard_rows(
                    embeddings, song_pos, counts_np, g, self.d
                )
                db3, coarse, _, self.Rc, _ = build_screen_layout(
                    loc_emb, loc_counts, pad=align_pad, k=screen_k,
                    d=self.d, R=R, n_pad=n_pad,
                    xla_tail=(self.impl != "pallas"),
                )
                db3_sh.append(db3)
                coarse_sh.append(coarse)
                valid_sh.append(np.arange(n_pad) < len(g))
                song_map[si, : len(g)] = g
                if self.score_alpha != 0.0:
                    # per-region real row counts (stage-2 out-of-song
                    # window mask) + flat-layout row validity (rescue's
                    # alpha mask); + pad trailing rows: the rescue body
                    # appends them for the XLA core's shifted slices
                    cpad = np.zeros(n_pad, np.int32)
                    cpad[: len(g)] = loc_counts.astype(np.int32)
                    counts_sh_l.append(cpad)
                    from pfann_tpu.index.align import build_row_valid

                    rv_sh_l.append(build_row_valid(
                        loc_counts, R, align_pad, n_pad * R + align_pad
                    ))
            shard_cast = lambda a: jax.device_put(
                jnp.asarray(host_cast(np.stack(a), db_dtype)), shard
            )
            self._db = shard_cast(db3_sh)
            cdt = coarse_dtype_of(screen_coarse_dtype, db_dtype)
            if cdt == jnp.int8:
                # one GLOBAL scale across shards (scale is irrelevant
                # anyway: the screen ranks within a (query, shard) pair
                # and the cross-shard merge uses exact stage-2 scores)
                self._coarse = jax.device_put(
                    jnp.asarray(quantize_coarse_int8(np.stack(coarse_sh))),
                    shard,
                )
            else:
                self._coarse = jax.device_put(
                    jnp.asarray(host_cast(np.stack(coarse_sh), cdt)), shard
                )
            self._song_valid = jax.device_put(
                jnp.asarray(np.stack(valid_sh)), shard
            )
            self._song_pos = None
            self._counts_sh = self._row_valid = None
            if self.score_alpha != 0.0:
                self._counts_sh = jax.device_put(
                    jnp.asarray(np.stack(counts_sh_l)), shard
                )
                self._row_valid = jax.device_put(
                    jnp.asarray(np.stack(rv_sh_l)), shard
                )
        elif engine == "align":
            # uniform-region layout per shard (index/align.py), common R
            # across shards so one program serves every chip
            lmax = int(counts.max()) if len(counts) else 0
            self.R = -(-(align_pad + lmax) // 8) * 8
            if self.impl == "pallas":
                # kernel constraints: song count a multiple of the song-
                # group size, no trailing pad (the kernel synthesizes the
                # zero halo — valid because every region leads with
                # align_pad >= S-1 zero rows)
                from pfann_tpu.index.pallas_align import PALLAS_G

                songs_max = -(-max(songs_max, 1) // PALLAS_G) * PALLAS_G
                rows = songs_max * self.R
            else:
                rows = songs_max * self.R + align_pad
            song_map = np.full((n_shards, songs_max), -1, dtype=np.int32)
            db_sh = np.zeros((n_shards, rows, self.d), dtype=np.float32)
            rv_sh_l = []
            for si, g in enumerate(groups):
                loc_emb, loc_counts = gather_shard_rows(
                    embeddings, song_pos, counts, g, self.d
                )
                if len(g):
                    # vectorized region fill: local row i (song s_i, intra
                    # offset o_i) lands at s_i*R + align_pad + o_i
                    song_of = np.repeat(
                        np.arange(len(g), dtype=np.int64), loc_counts
                    )
                    intra = np.arange(
                        loc_emb.shape[0], dtype=np.int64
                    ) - np.repeat(np.cumsum(loc_counts) - loc_counts, loc_counts)
                    db_sh[si, song_of * self.R + align_pad + intra] = loc_emb
                    song_map[si, : len(g)] = g
                if self.score_alpha != 0.0:
                    from pfann_tpu.index.align import build_row_valid

                    rv_sh_l.append(
                        build_row_valid(loc_counts, self.R, align_pad, rows)
                    )
            self._db = jax.device_put(
                jnp.asarray(host_cast(db_sh, db_dtype)), shard
            )
            self._song_pos = None
            self._counts_sh = self._row_valid = None
            if self.score_alpha != 0.0:
                self._row_valid = jax.device_put(
                    jnp.asarray(np.stack(rv_sh_l)), shard
                )
        else:
            rows_max = max(
                (int(sum(counts[s] for s in g)) for g in groups), default=1
            )
            rows_max = max(rows_max, 8)
            song_map = np.full((n_shards, songs_max), -1, dtype=np.int32)
            db_sh = np.zeros((n_shards, rows_max, self.d), dtype=np.float32)
            song_pos_sh = np.zeros((n_shards, songs_max + 1), dtype=np.int32)
            for si, g in enumerate(groups):
                loc_emb, loc_counts = gather_shard_rows(
                    embeddings, song_pos, counts, g, self.d
                )
                db_sh[si, : loc_emb.shape[0]] = loc_emb
                song_pos_sh[si, 1 : len(g) + 1] = np.cumsum(loc_counts)
                song_pos_sh[si, len(g) + 1 :] = loc_emb.shape[0]  # zero-length padding songs
                song_map[si, : len(g)] = g
            self._db = jax.device_put(
                jnp.asarray(host_cast(db_sh, db_dtype)), shard
            )
            self._song_pos = jax.device_put(jnp.asarray(song_pos_sh), shard)
            self._counts_sh = self._row_valid = None

        self.songs_max = songs_max
        self.song_map = song_map  # host-side
        self._query_cache: dict[tuple[int, int], Any] = {}

    # ------------------------------------------------------------------
    def _make_query_fn(self, S: int, B: int):
        axis = self.axis
        top_k, fsm = self.top_k, self.frame_shift_mul
        alpha, backend = self.score_alpha, self.backend
        songs_max = self.songs_max

        if self.engine == "screen":
            from pfann_tpu.index.screen import screen_core

            core = partial(
                screen_core,
                k=self.screen_k, R=self.R, Rc=self.Rc, S=S,
                n_pad=songs_max, M=self.top_m, backend=self.backend,
                dt=self._db.dtype, impl=self.impl,
                interpret=self.interpret,
                score_alpha=alpha, pad=self.pad,
            )

            if alpha != 0.0:
                # alpha plumbing (seqscore.cpp:103-110): per-shard region
                # row counts mask out-of-song windows in stage 2;
                # q_valid [B, S] masks zero-padded query rows
                @partial(
                    jax.shard_map,
                    mesh=self.mesh,
                    in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
                    out_specs=(P(axis), P(axis), P(axis)),
                    check_vma=False,
                )
                def sharded_screen_a(db3_sh, coarse_sh, valid_sh,
                                     counts_sh, qpad, q_valid):
                    cand, best, argoff = core(
                        db3_sh[0], coarse_sh[0], qpad, valid_sh[0],
                        counts=counts_sh[0], q_valid=q_valid,
                    )
                    return cand[None], best[None], argoff[None]

                return jax.jit(sharded_screen_a)

            @partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P()),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False,
            )
            def sharded_screen(db3_sh, coarse_sh, valid_sh, qpad):
                cand, best, argoff = core(
                    db3_sh[0], coarse_sh[0], qpad, valid_sh[0]
                )
                return cand[None], best[None], argoff[None]

            return jax.jit(sharded_screen)

        if self.engine == "align":
            from pfann_tpu.index.align import alignment_core

            R, impl, interpret = self.R, self.impl, self.interpret

            if alpha != 0.0:
                # alpha plumbing: per-shard row_valid marks real song
                # rows (layout pad/slack must contribute 0, not
                # exp(-alpha)); q_valid comes from the caller's validity
                # mask transposed to alignment_core's [S, B] convention
                @partial(
                    jax.shard_map,
                    mesh=self.mesh,
                    in_specs=(P(axis), P(axis), P(), P()),
                    out_specs=(P(axis), P(axis)),
                    check_vma=False,
                )
                def sharded_align_a(db_sh, rv_sh, qpad, valid):
                    q = jnp.where(valid[:, :, None], qpad, 0.0)
                    best, argoff = alignment_core(
                        db_sh[0], q, R=R, S=S, n_songs=songs_max,
                        score_dtype=db_sh.dtype, impl=impl,
                        interpret=interpret, score_alpha=alpha,
                        row_valid=rv_sh[0],
                        q_valid=jnp.transpose(valid).astype(jnp.float32),
                    )
                    return best[None], argoff[None]

                return jax.jit(sharded_align_a)

            @partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(P(axis), P(), P()),
                out_specs=(P(axis), P(axis)),
                # pallas_call outputs carry no vma metadata — skip the
                # varying-mesh-axes check (each shard's call is local)
                check_vma=False,
            )
            def sharded_align(db_sh, qpad, valid):
                q = jnp.where(valid[:, :, None], qpad, 0.0)
                best, argoff = alignment_core(
                    db_sh[0], q, R=R, S=S, n_songs=songs_max,
                    score_dtype=db_sh.dtype, impl=impl, interpret=interpret,
                )
                return best[None], argoff[None]

            return jax.jit(sharded_align)

        def local_query(db, song_pos, qpad, valid):
            # db [rows_max, d]; song_pos [songs_max+1]; qpad [B, S, d]
            def one(q, v):
                _, labels = mips_topk(db, q, top_k, backend=backend)
                labels = jnp.where(v[:, None], labels, -1)
                return seq_rerank(
                    db, song_pos, q, labels, v, songs_max,
                    frame_shift_mul=fsm, score_alpha=alpha,
                )

            return jax.vmap(one)(qpad, valid)  # [B, songs_max] x2

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis)),
        )
        def sharded(db_sh, song_pos_sh, qpad, valid):
            smax, stime = local_query(db_sh[0], song_pos_sh[0], qpad, valid)
            return smax[None], stime[None]

        return jax.jit(sharded)

    def _make_rescue_fn(self, S: int):
        """Exhaustive per-shard alignment over the SAME resident screen
        regions (db3 [n_shards, n_pad, R, d] flattened per shard is a
        uniform alignment layout) — the stage-3 rescue body for escalated
        queries; no second copy of the database."""
        from pfann_tpu.index.align import alignment_core

        axis, R = self.axis, self.R
        alpha = self.score_alpha
        # alpha needs the per-window score slices -> XLA impl (same
        # forcing as ScreenedAlignmentEngine._rescue_fn)
        impl = "xla" if alpha != 0.0 else self.impl
        interpret = self.interpret
        songs_max = self.songs_max

        if alpha != 0.0:

            @partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(), P()),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            def sharded_rescue_a(db3_sh, rv_sh, qpad, valid):
                q = jnp.where(valid[:, :, None], qpad, 0.0)
                d = db3_sh.shape[-1]
                db = jnp.pad(
                    db3_sh[0].reshape(-1, d), ((0, self.pad), (0, 0))
                )
                best, argoff = alignment_core(
                    db, q, R=R, S=S,
                    n_songs=songs_max, score_dtype=db3_sh.dtype,
                    impl=impl, interpret=interpret, score_alpha=alpha,
                    row_valid=rv_sh[0],
                    q_valid=jnp.transpose(valid).astype(jnp.float32),
                )
                return best[None], argoff[None]

            return jax.jit(sharded_rescue_a)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
        def sharded_rescue(db3_sh, qpad, valid):
            q = jnp.where(valid[:, :, None], qpad, 0.0)
            d = db3_sh.shape[-1]
            db = db3_sh[0].reshape(-1, d)
            if impl == "xla":
                # screen regions carry no trailing pad (the Pallas kernel
                # synthesizes its halo); the XLA core's shifted slices
                # need S-1 readable rows past the last region
                db = jnp.pad(db, ((0, self.pad), (0, 0)))
            best, argoff = alignment_core(
                db, q, R=R, S=S,
                n_songs=songs_max, score_dtype=db3_sh.dtype,
                impl=impl, interpret=interpret,
            )
            return best[None], argoff[None]

        return jax.jit(sharded_rescue)

    def _rescue_chunk(self, S: int) -> int:
        """Escalated-batch dispatch width for the stage-3 rescue: the
        XLA alignment impl materializes a per-shard [songs_max*R, S, B]
        score tensor — cap it at 4 GiB like ScreenedAlignmentEngine's
        _rescue_chunk (the Pallas kernel streams and needs no cap)."""
        from pfann_tpu.index.pallas_align import HALO

        mb = 128
        if self.impl != "pallas" or S > HALO + 1:
            # S > HALO+1 silently falls back to XLA inside
            # alignment_core (queries beyond the fused kernel's halo),
            # so the cap must apply there too
            itemsize = 2 if self._db.dtype == jnp.bfloat16 else 4
            per_b = self.songs_max * self.R * S * itemsize
            mb = max(1, min(mb, (4 << 30) // max(per_b, 1)))
        return mb

    def _make_rescue_top1_fn(self, S: int, Be: int):
        """Stage-3 rescue for the sharded SERVING path: per-shard
        exhaustive alignment over the resident screen regions with a
        LOCAL top-1 inside the shard_map body, so only [n_shards, B]
        (value, slot, offset) rows cross shards for the global argmax —
        never a [B, n_songs] table (on-device or host)."""
        from pfann_tpu.index.align import alignment_core

        axis, R, pad = self.axis, self.R, self.pad
        alpha = self.score_alpha
        impl = "xla" if alpha != 0.0 else self.impl
        interpret = self.interpret
        songs_max = self.songs_max
        rv_specs = (P(axis),) if alpha != 0.0 else ()

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis)) + rv_specs + (P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        def body(db3_sh, valid_sh, *rest):
            (rv_sh, qpad, valid) = rest if alpha != 0.0 else (None,) + rest
            q = jnp.where(valid[:, :, None], qpad, 0.0)
            d = db3_sh.shape[-1]
            db = db3_sh[0].reshape(-1, d)
            if impl == "xla":
                db = jnp.pad(db, ((0, pad), (0, 0)))
            best, argoff = alignment_core(
                db, q, R=R, S=S, n_songs=songs_max,
                score_dtype=db3_sh.dtype, impl=impl, interpret=interpret,
                score_alpha=alpha,
                row_valid=rv_sh[0] if alpha != 0.0 else None,
                q_valid=(jnp.transpose(valid).astype(jnp.float32)
                         if alpha != 0.0 else None),
            )  # [Be, songs_max] x2
            best = jnp.where(valid_sh[0][None, :], best, -jnp.inf)
            slot = jnp.argmax(best, axis=1)  # [Be]
            take = jax.vmap(lambda b, o, s: (b[s], o[s]))(best, argoff, slot)
            return take[0][None], slot[None], take[1][None]

        @jax.jit
        def rtop1(db_sh, valid_sh, qpad, valid, inv_len, rv_sh=None):
            if alpha != 0.0:
                val, slot, off = body(db_sh, valid_sh, rv_sh, qpad, valid)
            else:
                val, slot, off = body(db_sh, valid_sh, qpad, valid)
            sc = (val * inv_len).astype(jnp.float32)  # [n_shards, Be]
            si = jnp.argmax(sc, axis=0)  # [Be] winning shard
            bi = jnp.arange(Be)
            flat = si.astype(jnp.int32) * songs_max + slot[si, bi].astype(
                jnp.int32
            )
            return sc[si, bi], flat, (off[si, bi] - pad).astype(jnp.float32)

        return rtop1

    def _fused_ok(self, Sp: int, Bp: int) -> bool:
        """True when the sharded rescued top-1 can run as ONE jitted
        program: stage 1+2 local top-1 merge, escalation gate, and the
        whole-batch per-shard exhaustive rescue behind a device-side
        ``lax.cond`` — no host sync to decide escalation (mirrors
        ScreenedAlignmentEngine._fused_ok).  Requires the whole-batch
        rescue to be affordable: always for the Pallas kernel, else the
        per-shard [songs_max*R, S, Bp] XLA score tensor must fit the
        4 GiB cap.  alpha keeps the host-gated path (its tau mapping is
        approximate and its masks ride the chunked rescue)."""
        if (self.engine != "screen" or self.rescue_tau is None
                or not self.n_songs or self.score_alpha != 0.0):
            return False
        from pfann_tpu.index.pallas_align import HALO

        if self.impl == "pallas" and Sp <= HALO + 1:
            return True
        itemsize = 2 if self._db.dtype == jnp.bfloat16 else 4
        per_b = self.songs_max * self.R * Sp * itemsize
        return per_b * Bp <= (4 << 30)

    def _make_top1_rescued_fn(self, Sp: int, Bp: int):
        """Fused rescued serving fast path: the screen top-1 merge and
        the stage-3 per-shard exhaustive rescue in one program, the
        rescue behind ``lax.cond(any(need))``.  The predicate derives
        from the replicated merged scores, so every device takes the
        same branch; clean batches never execute the rescue body."""
        top1 = self._make_top1_fn(Sp, Bp)
        rkey = ("rescue_top1", Sp, Bp)
        if rkey not in self._query_cache:
            self._query_cache[rkey] = self._make_rescue_top1_fn(Sp, Bp)
        rtop1 = self._query_cache[rkey]
        tau = float(self.rescue_tau)

        @jax.jit
        def fn(db_sh, coarse_sh, valid_sh, qpad, vmask, row_real,
               inv_len):
            val, fid, off = top1(db_sh, coarse_sh, valid_sh, qpad,
                                 inv_len)
            # padding rows (row_real False) never escalate — their
            # zero queries would otherwise always sit below tau
            need = (val < tau) & row_real

            def rescue(qp):
                rv, ri, ro = rtop1(db_sh, valid_sh, qp, vmask, inv_len)
                return (rv, ri.astype(fid.dtype), ro.astype(off.dtype))

            def skip(qp):
                return val, fid, off

            rv, ri, ro = jax.lax.cond(jnp.any(need), rescue, skip, qpad)
            return (
                jnp.where(need, rv, val),
                jnp.where(need, ri, fid),
                jnp.where(need, ro, off),
            )

        return fn

    def search_top1_rescued(self, qpad):
        """RESCUED serving fast path: search_top1_device's stages 1+2
        answer every query, then queries whose best exact MEAN score
        falls below ``rescue_tau`` are exhaustively rescored per shard
        with on-device local top-1 + tiny cross-shard merge — answers
        equal query_batch's (and hence the exhaustive control's) while
        the host traffic stays [B]-sized.  Returns HOST (score [B],
        flat_idx [B], offset [B]); map flat_idx via :meth:`flat_to_song`.
        For engine='align' (already exhaustive) or rescue disabled this
        is just the synced fast path.  When the fused one-program path
        applies (:meth:`_fused_ok`) the rescue already happened on
        device inside :meth:`search_top1_device` and this is just a
        sync; the host-gated chunked rescue below serves the remaining
        configurations (alpha, beyond-cap long-query layouts)."""
        B, S, _ = qpad.shape
        val, idx, off = self.search_top1_device(qpad)
        val = np.array(np.asarray(val), copy=True)
        idx = np.array(np.asarray(idx), copy=True)
        off = np.array(np.asarray(off), copy=True)
        Sp = bucket_windows(S, self.pad)
        if self.engine in ("align", "screen") and self.impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE

            Bp = -(-B // LANE) * LANE
        else:
            Bp = bucket_batch(B)
        if self.engine != "screen" or self.rescue_tau is None \
                or not self.n_songs or self._fused_ok(Sp, Bp):
            return val, idx, off
        esc = np.nonzero(val < self.rescue_tau)[0]
        if not len(esc):
            return val, idx, off
        from pfann_tpu.utils.logging import get_logger

        get_logger().info(
            "sharded screen top-1 rescue: %d/%d queries below tau=%.3f "
            "rescored exhaustively", len(esc), B, self.rescue_tau,
        )
        Sp = bucket_windows(S, self.pad)
        qdev = jnp.asarray(qpad)
        if Sp != S:
            qdev = jnp.pad(qdev, ((0, 0), (0, Sp - S), (0, 0)))
        mb = self._rescue_chunk(Sp)
        if self.impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE

            mb = max(LANE, mb // LANE * LANE)
        outs = []
        for i in range(0, len(esc), mb):
            take = np.asarray(esc[i : i + mb], dtype=np.int64)
            gidx = np.zeros(mb, np.int64)
            gidx[: len(take)] = take  # tail pads re-score row 0
            chunk = jnp.take(qdev, jnp.asarray(gidx), axis=0)
            vmask = np.zeros((mb, Sp), dtype=bool)
            vmask[: len(take), :S] = True
            rkey = ("rescue_top1", Sp, mb)
            if rkey not in self._query_cache:
                self._query_cache[rkey] = self._make_rescue_top1_fn(Sp, mb)
            outs.append(
                self._query_cache[rkey](
                    self._db, self._song_valid, chunk,
                    jnp.asarray(vmask), jnp.float32(1.0 / S),
                    rv_sh=self._row_valid,
                )
            )
        rv = np.concatenate([np.asarray(o[0]) for o in outs])[: len(esc)]
        ri = np.concatenate([np.asarray(o[1]) for o in outs])[: len(esc)]
        ro = np.concatenate([np.asarray(o[2]) for o in outs])[: len(esc)]
        val[esc], idx[esc], off[esc] = rv, ri, ro
        return val, idx, off

    def _make_top1_fn(self, Sp: int, Bp: int):
        """Device-side top-1 finalize over the sharded align tables: only
        (score, flat_index, offset) per query crosses the host boundary —
        the serving path's answer — instead of the [B, n_songs] tables
        (which the matcher still needs for its .bin contract).

        Offsets are pad-corrected (DB-hop units relative to song start),
        matching query_batch / AlignmentEngine._top1 semantics.  inv_len
        is traced so one compiled program serves every true query length
        inside the (Sp, Bp) bucket."""
        assert self.engine in ("align", "screen")
        qfn = self._make_query_fn(Sp, Bp)
        pad = self.pad
        songs_max = self.songs_max

        alpha = self.score_alpha

        if self.engine == "screen":

            @jax.jit
            def top1_screen(db_sh, coarse_sh, valid_sh, qpad, inv_len,
                            counts_sh=None, q_valid=None):
                # cand/best/argoff: [n_shards, Bp, M]; flat index =
                # shard * songs_max + local slot so flat_to_song's
                # song_map.reshape(-1) lookup works unchanged
                if alpha != 0.0:
                    cand, best, argoff = qfn(
                        db_sh, coarse_sh, valid_sh, counts_sh, qpad, q_valid
                    )
                else:
                    cand, best, argoff = qfn(db_sh, coarse_sh, valid_sh, qpad)
                n_shards = cand.shape[0]
                gflat = cand + (
                    jnp.arange(n_shards, dtype=cand.dtype)[:, None, None]
                    * songs_max
                )
                sc = (best * inv_len).astype(jnp.float32)
                flat = sc.transpose(1, 0, 2).reshape(Bp, -1)
                id_flat = gflat.transpose(1, 0, 2).reshape(Bp, -1)
                off_flat = argoff.transpose(1, 0, 2).reshape(Bp, -1)
                idx = jnp.argmax(flat, axis=1)
                val = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]
                fid = jnp.take_along_axis(id_flat, idx[:, None], 1)[:, 0]
                off = jnp.take_along_axis(off_flat, idx[:, None], 1)[:, 0]
                return val, fid, off - pad

            return top1_screen

        @jax.jit
        def top1(db_sh, qpad, inv_len, rv_sh=None, valid=None):
            if valid is None:
                valid = jnp.ones((Bp, Sp), dtype=bool)
            if alpha != 0.0:
                best, argoff = qfn(db_sh, rv_sh, qpad, valid)
            else:
                best, argoff = qfn(db_sh, qpad, valid)  # [n_shards, Bp, songs]
            sc = (best * inv_len).astype(jnp.float32)
            flat = sc.transpose(1, 0, 2).reshape(Bp, -1)
            off_flat = argoff.transpose(1, 0, 2).reshape(Bp, -1)
            idx = jnp.argmax(flat, axis=1)
            val = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]
            off = jnp.take_along_axis(off_flat, idx[:, None], 1)[:, 0]
            return val, idx, off - pad

        return top1

    def search_top1_device(self, qpad, rescued=True):
        """qpad: device [B, S, d] (full-length queries).  Returns device
        (score [B], flat_idx [B], offset [B] — pad-corrected, DB-hop
        units from song start); map flat_idx to global song ids with
        :meth:`flat_to_song`.

        S and B are bucketed exactly like query_batch (zero query rows
        score zero; results are sliced back to B), so ragged serving
        batches reuse the compiled program and the pallas kernel always
        sees full 128-lane groups.

        With ``rescued`` (default) and a screen rescue cut configured,
        the triples are STAGE-3-RESCUED answers whenever the fused
        one-program path applies (:meth:`_fused_ok`): pipelined serving
        never host-syncs to gate escalation, and the answers match
        ``query_batch``'s (and hence the exhaustive control's).
        ``rescued=False`` forces the bare stages-1+2 triples."""
        B, S, _ = qpad.shape
        Sp = bucket_windows(S, self.pad)
        if self.engine in ("align", "screen") and self.impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE

            Bp = -(-B // LANE) * LANE
        else:
            Bp = bucket_batch(B)
        if Sp != S or Bp != B:
            qpad = jnp.pad(qpad, ((0, Bp - B), (0, Sp - S), (0, 0)))
        if rescued and self._fused_ok(Sp, Bp):
            fkey = ("top1_rescued", Sp, Bp)
            if fkey not in self._query_cache:
                self._query_cache[fkey] = self._make_top1_rescued_fn(
                    Sp, Bp
                )
            vmask = np.zeros((Bp, Sp), dtype=bool)
            vmask[:B, :S] = True
            row_real = np.zeros(Bp, dtype=bool)
            row_real[:B] = True
            val, idx, off = self._query_cache[fkey](
                self._db, self._coarse, self._song_valid, qpad,
                jnp.asarray(vmask), jnp.asarray(row_real),
                jnp.float32(1.0 / S),
            )
            if Bp != B:
                val, idx, off = val[:B], idx[:B], off[:B]
            return val, idx, off
        key = ("top1", Sp, Bp)
        if key not in self._query_cache:
            self._query_cache[key] = self._make_top1_fn(Sp, Bp)
        qv = None
        if self.score_alpha != 0.0:
            # mark the B real queries' first S window rows (padded rows
            # must contribute 0, not exp(-alpha))
            v = np.zeros((Bp, Sp), dtype=bool)
            v[:B, :S] = True
            qv = jnp.asarray(v)
        if self.engine == "screen":
            val, idx, off = self._query_cache[key](
                self._db, self._coarse, self._song_valid, qpad,
                jnp.float32(1.0 / S),
                counts_sh=self._counts_sh,
                q_valid=(
                    qv.astype(jnp.float32) if qv is not None else None
                ),
            )
        else:
            val, idx, off = self._query_cache[key](
                self._db, qpad, jnp.float32(1.0 / S),
                rv_sh=self._row_valid, valid=qv,
            )
        if Bp != B:
            val, idx, off = val[:B], idx[:B], off[:B]
        return val, idx, off

    def flat_to_song(self, flat_idx: np.ndarray) -> np.ndarray:
        """Map flat (shard * songs_max + slot) indices from
        search_top1_device to global song ids."""
        return self.song_map.reshape(-1)[np.asarray(flat_idx)]

    def query_batch(
        self, queries: list[np.ndarray], pad_to: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (song_max [B, n_songs], song_time [B, n_songs]) in
        *global* song order (padded slots dropped)."""
        B = len(queries)
        S = pad_to or max(q.shape[0] for q in queries)
        # bucket S and B so ragged batches / varying query lengths reuse
        # the compiled program (zero-padded rows contribute zero score);
        # the pallas kernel additionally needs B in full 128-lane groups
        S = bucket_windows(S, self.pad)
        if self.engine in ("align", "screen") and self.impl == "pallas":
            from pfann_tpu.index.pallas_align import LANE

            Bp = -(-B // LANE) * LANE
        else:
            Bp = bucket_batch(B)
        qpad = np.zeros((Bp, S, self.d), dtype=np.float32)
        valid = np.zeros((Bp, S), dtype=bool)
        for i, q in enumerate(queries):
            qpad[i, : q.shape[0]] = q
            valid[i, : q.shape[0]] = True
        key = (S, Bp)
        if key not in self._query_cache:
            self._query_cache[key] = self._make_query_fn(S, Bp)
        if self.engine == "screen":
            # per-shard top-M survivors scattered into the global table;
            # pruned songs keep (0, 0) — the screened engine's
            # untouched-candidate convention (index/screen.py:search)
            if self.score_alpha != 0.0:
                cand, best, argoff = self._query_cache[key](
                    self._db, self._coarse, self._song_valid,
                    self._counts_sh, jnp.asarray(qpad),
                    jnp.asarray(valid.astype(np.float32)),
                )
            else:
                cand, best, argoff = self._query_cache[key](
                    self._db, self._coarse, self._song_valid,
                    jnp.asarray(qpad)
                )
            cand = np.asarray(cand)[:, :B]     # [n_shards, B, M]
            best = np.asarray(best)[:, :B]
            argoff = np.asarray(argoff)[:, :B]
            lens = np.maximum(
                np.asarray([q.shape[0] for q in queries]), 1
            ).astype(np.float32)
            out_max = np.zeros((B, self.n_songs), dtype=np.float32)
            out_time = np.zeros((B, self.n_songs), dtype=np.float32)
            bidx = np.broadcast_to(
                np.arange(B)[:, None], (B, self.top_m)
            )
            for si in range(self.n_shards):
                ids = self.song_map[si][cand[si]]  # [B, M]; -1 = padding
                ok = ids >= 0
                out_max[bidx[ok], ids[ok]] = (
                    best[si] / lens[:, None]
                )[ok]
                out_time[bidx[ok], ids[ok]] = (argoff[si] - self.pad)[ok]
            if self.rescue_tau is not None and self.n_songs:
                true_lens = np.asarray([q.shape[0] for q in queries])
                esc = np.nonzero(
                    (out_max.max(axis=1) < self.rescue_tau)
                    & (true_lens > 0)
                )[0]
                if len(esc):
                    from pfann_tpu.utils.logging import get_logger

                    get_logger().info(
                        "sharded screen rescue: %d/%d queries below "
                        "tau=%.3f rescored exhaustively",
                        len(esc), B, self.rescue_tau,
                    )
                    # memory-guarded dispatch (ADVICE r4): the XLA impl
                    # materializes [songs_max*R, S, Be] per shard — cap
                    # the escalated chunk like screen.py's _rescue
                    mb = self._rescue_chunk(S)
                    if self.impl == "pallas":
                        from pfann_tpu.index.pallas_align import LANE

                        mb = max(LANE, mb // LANE * LANE)
                    rbs, ros = [], []
                    for i0 in range(0, len(esc), mb):
                        take = esc[i0 : i0 + mb]
                        if self.impl == "pallas":
                            from pfann_tpu.index.pallas_align import LANE

                            Be = -(-len(take) // LANE) * LANE
                        else:
                            Be = bucket_batch(len(take))
                        Be = min(Be, mb)
                        qr = np.zeros((Be, S, self.d), dtype=np.float32)
                        vr = np.zeros((Be, S), dtype=bool)
                        qr[: len(take)] = qpad[take]
                        vr[: len(take)] = valid[take]
                        rkey = ("rescue", S, Be)
                        if rkey not in self._query_cache:
                            self._query_cache[rkey] = self._make_rescue_fn(S)
                        if self.score_alpha != 0.0:
                            rb, ro = self._query_cache[rkey](
                                self._db, self._row_valid,
                                jnp.asarray(qr), jnp.asarray(vr)
                            )
                        else:
                            rb, ro = self._query_cache[rkey](
                                self._db, jnp.asarray(qr), jnp.asarray(vr)
                            )
                        rbs.append(np.asarray(rb)[:, : len(take)])
                        ros.append(np.asarray(ro)[:, : len(take)])
                    rb = np.concatenate(rbs, axis=1)  # [n_shards, e, songs]
                    ro = np.concatenate(ros, axis=1)
                    le = lens[esc]
                    for si in range(self.n_shards):
                        ids = self.song_map[si]
                        real = ids >= 0
                        out_max[np.ix_(esc, ids[real])] = (
                            rb[si][:, real] / le[:, None]
                        )
                        out_time[np.ix_(esc, ids[real])] = (
                            ro[si][:, real] - self.pad
                        )
            return out_max, out_time
        if self.engine == "align":
            if self.score_alpha != 0.0:
                best, argoff = self._query_cache[key](
                    self._db, self._row_valid,
                    jnp.asarray(qpad), jnp.asarray(valid)
                )
            else:
                best, argoff = self._query_cache[key](
                    self._db, jnp.asarray(qpad), jnp.asarray(valid)
                )
            lens = np.maximum(np.asarray([q.shape[0] for q in queries]), 1)
            smax = np.asarray(best)[:, :B] / lens[None, :, None]
            stime = (np.asarray(argoff)[:, :B] - self.pad).astype(np.float32)
        else:
            smax, stime = self._query_cache[key](
                self._db, self._song_pos, jnp.asarray(qpad), jnp.asarray(valid)
            )
            smax = np.asarray(smax)[:, :B]   # [n_shards, B, songs_max]
            stime = np.asarray(stime)[:, :B]
        out_max = np.full((B, self.n_songs), -np.inf, dtype=np.float32)
        out_time = np.zeros((B, self.n_songs), dtype=np.float32)
        for si in range(self.n_shards):
            ids = self.song_map[si]
            real = ids >= 0
            out_max[:, ids[real]] = smax[si][:, real]
            out_time[:, ids[real]] = stime[si][:, real]
        return out_max, out_time
