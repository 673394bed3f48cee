"""Fingerprint database: directory format + device-resident query engine.

Parity target: reference database.py:74-195 and the DB directory contract
(builder.py:133-148, readme.md:123-184):

    <db>/embeddings    raw float32 [N, d] (same format as the reference)
    <db>/landmarkKey   int32 per-song segment counts (same)
    <db>/songList.txt  one path per line (same)
    <db>/configs.json  the training config snapshot (same)
    <db>/model.msgpack flax params (replaces the reference's model.pt)
    <db>/index_meta.json  search settings (replaces the opaque faiss
                          ``landmarkValue`` binary — the TPU engine is
                          exact/approx MIPS over ``embeddings`` itself, so
                          no trained index artifact is needed)

Query semantics follow database.py:111-166: top-k ANN search per query
row, candidate (song, offset) generation, sequence-alignment rerank,
per-song best table, global best.  ``frame_shift_mul`` sub-hop striding
and ``score_alpha`` are supported (database.py:129-134, seqscore.cpp:103).

TPU-native design: the embedding matrix lives in device HBM (bf16 or f32);
queries are padded to a small set of static bucket lengths so every
(bucket, top_k) pair compiles exactly once.  A batched entry point
amortizes HBM reads of the DB matrix across many queries — the headline
throughput path (see bench.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pfann_tpu.index.search import (
    bucket_batch,
    bucket_windows,
    finalize_song_scores,
    search_and_rerank,
)
from pfann_tpu.utils import read_file_list
from pfann_tpu.utils.logging import get_logger

INDEX_META_NAME = "index_meta.json"
MODEL_FILE_NAME = "model.msgpack"

_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


def write_index_meta(dir_for_db: str, d: int, meta: dict[str, Any] | None = None):
    out = {"version": 1, "metric": "inner_product", "d": d}
    if meta:
        out.update(meta)
    with open(os.path.join(dir_for_db, INDEX_META_NAME), "w") as f:
        json.dump(out, f, indent=2)


class Database:
    """Loads a DB directory and answers queries on device.

    Mirrors reference Database.__init__ (database.py:74-109): songList +
    landmarkKey -> cumulative song_pos; the embedding matrix replaces the
    faiss index.
    """

    def __init__(
        self,
        dir_for_db: str,
        indexer_params: dict[str, Any],
        hop_size: float,
        device=None,
    ):
        self.dir_for_db = dir_for_db
        self.params = indexer_params
        self.top_k = int(self.params["top_k"])
        self.frame_shift_mul = int(self.params.get("frame_shift_mul", 1))
        self.score_alpha = float(self.params.get("score_alpha", 0))
        self.hop_size = hop_size

        self.songList = read_file_list(os.path.join(dir_for_db, "songList.txt"))
        counts = np.fromfile(
            os.path.join(dir_for_db, "landmarkKey"), dtype=np.int32
        )
        assert len(self.songList) == counts.shape[0]  # database.py:85
        self.song_pos = np.pad(np.cumsum(counts, dtype=np.int64), (1, 0))

        meta_path = os.path.join(dir_for_db, INDEX_META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            d = int(meta["d"])
        else:
            meta = {}
            d = int(self.params.get("d", 128))
        self.meta = meta
        emb = np.fromfile(
            os.path.join(dir_for_db, "embeddings"), dtype=np.float32
        ).reshape([-1, d])
        assert emb.shape[0] == self.song_pos[-1], (emb.shape, self.song_pos[-1])
        self.d = d
        self.ntotal = emb.shape[0]

        # search backend: 'exact' | 'approx' | 'auto' (approx on TPU)
        backend = self.params.get("backend", "auto")
        if backend == "auto":
            backend = "approx" if jax.default_backend() == "tpu" else "exact"
        self.backend = backend

        dtype = self.params.get("db_dtype", "bfloat16")
        np_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        # engine: 'align' (exhaustive alignment, the TPU-native default),
        # 'screen' (two-stage: coarse pooled prune + exact alignment —
        # the faiss-IVF role for large DBs, index/screen.py), or 'topk'
        # (reference-style per-segment top-k + rerank).  score_alpha
        # scoring (seqscore.cpp:103-110) rides the fast engines too: the
        # exp transform is applied per window slice before the diagonal
        # sum (index/align.py alpha path; screen stage 2).
        engine = self.params.get("engine", "align")
        # screen: true | false | 'auto' (default) — auto upgrades the
        # exhaustive engine to the two-stage one once the DB is past the
        # measured align/screen throughput crossover: at 20k tracks the
        # exhaustive kernel still wins (19,963 vs 16,162 q/s/chip,
        # BENCH_r04_db_rescued.json), at 100k the screen wins 5x
        # (13,263 vs 2,651, BENCH_r03_scale.json) — the crossover sits
        # near 30k songs, so auto keeps the recall-1.0-by-construction
        # exhaustive engine until the screen actually pays for itself
        screen = self.params.get("screen", "auto")
        if engine == "align" and (
            screen is True or (screen == "auto" and len(counts) >= 30_000)
        ):
            engine = "screen"
        self.engine = engine
        self._np_dtype = np_dtype
        self._device = device
        self._emb_host = emb
        self._db = None  # raw matrix uploaded lazily (topk path only)
        self._song_pos = None
        self._sharded = None
        # align_pad caps the fast engines' max query windows (layout
        # leading-zero rows); raise it (e.g. 128) to serve 60 s MIREX
        # queries without the topk fallback, at +pad rows/song of HBM.
        # Resolution order: explicit indexer knob > the build-time value
        # recorded in index_meta (builder.py's indexer.max_query_sec) >
        # engine default — so a DB built for long queries serves them on
        # the fast path with zero load-time configuration
        self.align_pad = (
            int(self.params.get("align_pad", 0))
            or int(meta.get("align_pad", 0))
            or None
        )
        self._fallback_logged: set = set()
        sharded = self.params.get("sharded", False) and jax.device_count() > 1
        if engine in ("align", "screen") and sharded:
            # song-sharded retrieval over all local devices (ICI mesh);
            # engine='screen' screens per shard (local coarse prune +
            # exact rescore, union of local top-M survivors)
            from pfann_tpu.index.align import DEFAULT_PAD
            from pfann_tpu.parallel.mesh import make_mesh
            from pfann_tpu.parallel.sharded_search import ShardedDatabase

            self._sharded = ShardedDatabase(
                emb, counts, make_mesh("db"), engine=engine,
                db_dtype=np_dtype,
                align_pad=self.align_pad or DEFAULT_PAD,
                screen_k=int(self.params.get("screen_pool_k", 4)),
                screen_top_m=int(self.params.get("screen_top_m", 32)),
                screen_coarse_dtype=self.params.get("screen_coarse_dtype"),
                backend=self.params.get("backend", "auto"),
                # alpha rides the sharded fast engines too: per-shard
                # row_valid / counts masks keep the exp transform exact
                # (seqscore.cpp:103-110 semantics on every shard)
                score_alpha=self.score_alpha,
                screen_rescue=float(
                    self.params.get("screen_rescue", 0.4) or 0.0
                ) or None,
            )
        elif engine == "align":
            from pfann_tpu.index.align import DEFAULT_PAD, AlignmentEngine

            self._align = AlignmentEngine(
                emb, counts, score_dtype=np_dtype, device=device,
                pad=self.align_pad or DEFAULT_PAD,
                score_alpha=self.score_alpha,
            )
        elif engine == "screen":
            from pfann_tpu.index.align import DEFAULT_PAD
            from pfann_tpu.index.screen import ScreenedAlignmentEngine

            self._align = ScreenedAlignmentEngine(
                emb, counts, score_dtype=np_dtype, device=device,
                pad=self.align_pad or DEFAULT_PAD,
                k=int(self.params.get("screen_pool_k", 4)),
                top_m=int(self.params.get("screen_top_m", 32)),
                # stage-1 dtype: 'int8' doubles MXU rate / halves coarse
                # HBM reads; survivors are always rescored exactly
                coarse_dtype=self.params.get("screen_coarse_dtype"),
                # exact-stage storage: 'int8' quarters resident HBM vs
                # f32 (500k-track single-chip regime) with an f32 winner
                # rescore from the host matrix
                exact_dtype=self.params.get("screen_exact_dtype"),
                # honor the user's explicit 'exact'/'approx' top-M knob
                # (same key the topk engine reads above)
                backend=self.params.get("backend", "auto"),
                score_alpha=self.score_alpha,
                # stage-3 exhaustive rescue of low-best-score queries
                # (screen_rescue: mean-IP cut, 0/false disables) — keeps
                # screened answers identical to the exhaustive engine's
                # (measured at 20k tracks, ACCURACY_r04.md)
                rescue_threshold=float(
                    self.params.get("screen_rescue", 0.4) or 0.0
                ) or None,
            )
        else:
            self._ensure_raw_db()
        get_logger().info("score alpha: %d", self.score_alpha)

    def _ensure_raw_db(self) -> None:
        """Upload the flat embedding matrix (used by the topk engine and
        as the long-query fallback of the align engine)."""
        if self._db is None:
            from pfann_tpu.utils.fastcast import host_cast

            self._db = jax.device_put(
                jnp.asarray(host_cast(self._emb_host, self._np_dtype)),
                self._device,
            )
            self._song_pos = jax.device_put(
                jnp.asarray(self.song_pos, jnp.int32), self._device
            )

    # ------------------------------------------------------------------
    def query_embeddings(
        self, query: np.ndarray
    ) -> tuple[float, tuple[int, float], np.ndarray]:
        """One query: [S, d] float32 (rows at hop/frame_shift_mul stride).

        Returns (best_score, (song_id, time_seconds), song_score[n_songs, 2])
        — the exact contract of database.py:111-115.
        """
        if self.ntotal == 0 or query.shape[0] == 0:
            return -float("inf"), (-1, 0.0), np.zeros(
                [len(self.songList), 2], dtype=np.float32
            )
        if self._use_align(query.shape[0]):
            song_max, song_time = self._query_align_batch([query])
            song_max, song_time = song_max[0], song_time[0]
        else:
            song_max, song_time = self._query_device(query)
        return finalize_song_scores(
            np.asarray(song_max),
            np.asarray(song_time),
            self.hop_size,
            self.frame_shift_mul,
        )

    def _use_align(self, n_rows: int) -> bool:
        if self.engine not in ("align", "screen"):
            return False
        sub_len = -(-n_rows // self.frame_shift_mul)
        max_windows = (
            self._sharded.pad if self._sharded is not None
            else self._align.max_query_windows()
        )
        if sub_len > max_windows:
            # no SILENT engine cliff (VERDICT r3): long queries fall back
            # to the reference-style topk+rerank scan — log it once per
            # length so the serving path is observable, and point at the
            # knob that keeps such queries on the fast engine
            if sub_len not in self._fallback_logged:
                self._fallback_logged.add(sub_len)
                get_logger().warning(
                    "query with %d windows exceeds the %s engine's %d-"
                    "window layout pad; serving via the topk fallback "
                    "engine (build/load with indexer align_pad >= %d to "
                    "keep it on the fast path)",
                    sub_len, self.engine, max_windows, sub_len,
                )
            return False
        return True

    def _query_align_batch(self, queries):
        """Exhaustive alignment for a batch of queries; returns
        (song_max [B, n_songs], song_time_subhop [B, n_songs]) in the
        seqscore time convention (t * fsm - shift, seqscore.cpp:114)."""
        from pfann_tpu.index.align import queries_to_filters

        fsm = self.frame_shift_mul
        if self._sharded is not None:
            max_w = self._sharded.pad
            filt_list = [q[s::fsm][:max_w] for q in queries for s in range(fsm)]
            score, t = self._sharded.query_batch(filt_list)
        else:
            filters, sub_lens = [], []
            for q in queries:
                f, sl, _ = queries_to_filters(q, fsm, self._align.max_query_windows())
                filters.append(f)
                sub_lens.append(sl)
            # bucket the window count to multiples of 8 (zero filter rows
            # score zero) so ragged query lengths reuse the program
            S_max = max(f.shape[1] for f in filters)
            S_max = bucket_windows(S_max, self._align.max_query_windows())
            allf = np.zeros((len(queries) * fsm, S_max, self.d), np.float32)
            for i, f in enumerate(filters):
                allf[i * fsm : (i + 1) * fsm, : f.shape[1]] = f
            score, t = self._align.search(allf, np.concatenate(sub_lens))
        score = score.reshape(len(queries), fsm, -1)
        t = t.reshape(len(queries), fsm, -1)
        shift = np.arange(fsm)[None, :, None]
        t_subhop = t * fsm - shift
        # The plain argmax is safe even for the screen engine's pruned
        # (exactly 0.0) entries: the alignment layout always scores
        # offsets where the query lies entirely inside the PAD zeros
        # (S <= pad is enforced by _use_align), so every per-song best —
        # exhaustive or screened survivor — is floored at exactly 0 and a
        # pruned shift's 0.0 can never outrank a surviving shift's value
        # (tests/test_screen.py::test_per_song_best_is_zero_floored).
        best_shift = np.argmax(score, axis=1)  # [B, n_songs]
        gi = np.indices(best_shift.shape)
        return (
            score[gi[0], best_shift, gi[1]],
            t_subhop[gi[0], best_shift, gi[1]].astype(np.float32),
        )

    def query_embeddings_batch(
        self, queries: Sequence[np.ndarray]
    ) -> list[tuple[float, tuple[int, float], np.ndarray]]:
        """Batched throughput path: many queries scored in one device
        program (vmapped), amortizing DB HBM reads across the batch."""
        if not queries:
            return []
        if self._use_align(max(q.shape[0] for q in queries)):
            song_max, song_time = self._query_align_batch(queries)
            return [
                finalize_song_scores(
                    song_max[i], song_time[i], self.hop_size, self.frame_shift_mul
                )
                for i in range(len(queries))
            ]
        self._ensure_raw_db()
        S = _bucket(max(q.shape[0] for q in queries))
        B = len(queries)
        Bp = bucket_batch(B)
        qpad = np.zeros((Bp, S, self.d), dtype=np.float32)
        valid = np.zeros((Bp, S), dtype=bool)
        for i, q in enumerate(queries):
            qpad[i, : q.shape[0]] = q
            valid[i, : q.shape[0]] = True
        song_max, song_time = self._batch_query_fn(S)(
            self._db, self._song_pos, jnp.asarray(qpad), jnp.asarray(valid)
        )
        song_max = np.asarray(song_max)
        song_time = np.asarray(song_time)
        return [
            finalize_song_scores(
                song_max[i], song_time[i], self.hop_size, self.frame_shift_mul
            )
            for i in range(B)
        ]

    def query_top1_batch(
        self, queries: Sequence[np.ndarray]
    ) -> list[tuple[float, tuple[int, float]]]:
        """Serving fast path: the best (score, (song_id, time_seconds))
        per query with [B]-sized D2H — the RESCUED top-1 answer, equal
        to ``query_embeddings_batch``'s argmax (the reference's query
        API always returns the correct best answer,
        /root/reference/database.py:111-115) without paying the
        [B, n_songs] table transfer.  On the screen engine the answers
        ride the fused lax.cond rescue; on the align engine recall is
        1.0 by construction.  Long queries, the topk engine, and
        score_alpha fall back to the full-table path."""
        if not queries:
            return []
        if self.ntotal == 0:
            return [(-float("inf"), (-1, 0.0))] * len(queries)
        if (self.score_alpha != 0.0
                or not self._use_align(max(q.shape[0] for q in queries))):
            return [r[:2] for r in self.query_embeddings_batch(queries)]
        from pfann_tpu.index.align import queries_to_filters

        fsm = self.frame_shift_mul
        B = len(queries)
        scale = self.hop_size / fsm
        if self._sharded is not None:
            max_w = self._sharded.pad
            subs = [q[s::fsm][:max_w] for q in queries for s in range(fsm)]
            S = bucket_windows(max(len(s) for s in subs), max_w)
            qpad = np.zeros((len(subs), S, self.d), np.float32)
            for i, sub in enumerate(subs):
                qpad[i, : len(sub)] = sub
            val, idx, off = self._sharded.search_top1_rescued(
                jnp.asarray(qpad)
            )
            song = self._sharded.flat_to_song(np.asarray(idx))
            # the sharded top-1 normalizes by the padded bucket width
            # (uniform across songs, so its argmax is unaffected);
            # recover per-query mean-IP units: sum = val * S, mean =
            # sum / true_len (zero-padded rows contribute 0 to the sum)
            lens = np.array([len(s) for s in subs], np.float32)
            mean = np.asarray(val, np.float32) * S / np.maximum(lens, 1)
            t = np.asarray(off, np.float32)
        else:
            max_w = self._align.max_query_windows()
            filters, sub_lens = [], []
            for q in queries:
                f, sl, _ = queries_to_filters(q, fsm, max_w)
                filters.append(f)
                sub_lens.append(sl)
            S_max = bucket_windows(
                max(f.shape[1] for f in filters), max_w
            )
            allf = np.zeros((B * fsm, S_max, self.d), np.float32)
            for i, f in enumerate(filters):
                allf[i * fsm : (i + 1) * fsm, : f.shape[1]] = f
            lens = np.concatenate(sub_lens)
            song, ssum, t = self._align.search_top1(allf, lens)
            mean = ssum / np.maximum(lens, 1)
        # merge the fsm shifted variants per query (seqscore.cpp:114
        # sub-hop time convention, same math as _query_align_batch)
        mean = mean.reshape(B, fsm)
        song = np.asarray(song).reshape(B, fsm)
        t_sub = t.reshape(B, fsm) * fsm - np.arange(fsm)[None, :]
        pick = np.argmax(mean, axis=1)
        bi = np.arange(B)
        return [
            (
                float(mean[i, pick[i]]),
                (int(song[i, pick[i]]),
                 float(t_sub[i, pick[i]] * scale)),
            )
            for i in range(B)
        ]

    # ------------------------------------------------------------------
    def _query_device(self, query: np.ndarray):
        self._ensure_raw_db()
        S = _bucket(query.shape[0])
        qpad = np.zeros((S, self.d), dtype=np.float32)
        qpad[: query.shape[0]] = query
        valid = np.zeros((S,), dtype=bool)
        valid[: query.shape[0]] = True
        return search_and_rerank(
            self._db,
            self._song_pos,
            jnp.asarray(qpad),
            jnp.asarray(valid),
            top_k=self.top_k,
            n_songs=len(self.songList),
            frame_shift_mul=self.frame_shift_mul,
            score_alpha=self.score_alpha,
            backend=self.backend,
        )

    def _batch_query_fn(self, S: int):
        if not hasattr(self, "_batch_cache"):
            self._batch_cache = {}
        if S not in self._batch_cache:
            n_songs = len(self.songList)
            top_k, fsm = self.top_k, self.frame_shift_mul
            alpha, backend = self.score_alpha, self.backend

            @jax.jit
            def fn(db, song_pos, qpad, valid):
                return jax.vmap(
                    lambda q, v: search_and_rerank(
                        db,
                        song_pos,
                        q,
                        v,
                        top_k=top_k,
                        n_songs=n_songs,
                        frame_shift_mul=fsm,
                        score_alpha=alpha,
                        backend=backend,
                    )
                )(qpad, valid)

            self._batch_cache[S] = fn
        return self._batch_cache[S]
