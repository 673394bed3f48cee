#!/usr/bin/env python
"""Headline benchmark: retrieval throughput on the real TPU chip.

Scenario (BASELINE.md target): 10 s queries (19 segments) against a
10k-track database (1.2M x 128 embeddings), full search — the part the
reference spends its time in (faiss IVF-PQ search + Python/C++ rerank,
database.py:117-166).  This framework's engine is the exhaustive
alignment scan (index/align.py + the Pallas fused kernel), which scores
every (song, offset) — recall 1.0 vs the reference's IVF-PQ nprobe=50.
Target: >= 5000 queries/s/chip.

Measurement notes (this sandbox's TPU is tunneled): identical inputs are
served from a relay cache and per-call host syncs cost ~60-150 ms fixed,
so we use distinct query batches and slope-based timing (T(M2)-T(M1)) /
(M2-M1) with pipelined dispatch — the steady-state serving regime.

Prints ONE JSON line:
    {"metric": "queries_per_sec", "value": N, "unit": "10s-queries/s/chip",
     "vs_baseline": N / 5000}
"""

import json
import os
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()  # PFANN_PLATFORM=cpu dev runs / compile cache


def main(sharded: bool = False, scale: int = 0,
         batch_sweep: bool = False, int8_exact: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from pfann_tpu.index.align import AlignmentEngine

    rng = np.random.default_rng(0)
    n_songs, segs_per_song, d = 10_000, 120, 128
    if scale:
        n_songs = scale
    counts = np.full(n_songs, segs_per_song, dtype=np.int64)
    emb = rng.standard_normal((n_songs * segs_per_song, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    if scale:
        # the 100k-track north star (SURVEY §2.3, BASELINE.json configs[3])
        # runs the two-stage screened engine — coarse pooled prune + exact
        # alignment rescore (index/screen.py), the faiss-IVF role done
        # dense.  The exhaustive scan measures 2.6k q/s at this scale
        # (docs/DESIGN.md); the screen's k^2 work reduction is what buys
        # the >=5k target.
        from pfann_tpu.index.screen import ScreenedAlignmentEngine

        engine = ScreenedAlignmentEngine(
            emb, counts, score_dtype=jnp.bfloat16,
            k=int(os.environ.get("BENCH_SCREEN_K", 4)),
            top_m=int(os.environ.get("BENCH_SCREEN_M", 32)),
            # 'int8' runs stage 1 on the MXU's double-rate int8 path
            coarse_dtype=(
                "int8" if int8_exact
                else os.environ.get("BENCH_SCREEN_DTYPE") or None
            ),
            # --int8-exact: the 300k-500k-track single-chip regime — the
            # resident exact layout is int8 (1 B/elem vs bf16's 2; an
            # f32/bf16 layout would not fit v5e HBM past ~350k tracks)
            # with recall guarded by the sanity assert below and the f32
            # winner rescore in the table paths
            exact_dtype="int8" if int8_exact else None,
            # the production default: stage-3 rescue on (the serving
            # answers are exhaustive-parity; the fused lax.cond path
            # keeps the gate on device so pipelined dispatch never
            # stalls — clean traffic runs at bare stages-1+2 speed)
            rescue_threshold=0.4,
        )
        map_song = np.asarray
    elif sharded:
        # the multi-chip serve path on a 1-shard mesh: must match the
        # unsharded headline (VERDICT r1 weak #2) — same fused Pallas
        # kernel, same device-side top-1 finalize, plus the shard_map/
        # all-gather plumbing that scales it out
        from pfann_tpu.parallel.mesh import make_mesh
        from pfann_tpu.parallel.sharded_search import ShardedDatabase

        sdb = ShardedDatabase(
            emb, counts, make_mesh("db", 1), engine="align",
            db_dtype=jnp.bfloat16, align_pad=32,
        )

        class _EngineShim:
            # same serving contract as AlignmentEngine.search_top1_device:
            # device arrays out, no host sync inside the call (keeps the
            # bench's pipelined dispatch honest)
            max_batch = 1024

            def search_top1_device(self, qpad):
                val, idx, off = sdb.search_top1_device(qpad)
                return ((idx, val, off),)

        engine = _EngineShim()
        map_song = sdb.flat_to_song
    else:
        engine = AlignmentEngine(
            emb, counts, score_dtype=jnp.bfloat16, impl="auto"
        )
        map_song = np.asarray
    B = engine.max_batch
    S = 19  # 10 s query at 0.5 s hop (matcher.py:109-110)

    def make_batch(seed, noise=0.1):
        r = np.random.default_rng(seed)
        filters = np.zeros((B, S, d), np.float32)
        sources = []
        for b in range(B):
            song = int(r.integers(0, n_songs))
            off = int(r.integers(0, segs_per_song - S))
            q = emb[song * segs_per_song + off :][:S].copy()
            q += noise * r.standard_normal((S, d)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            filters[b] = q
            sources.append(song)
        return filters, sources

    # warmup / compile + recall sanity on noisy queries (top-1 serve path:
    # only (song, score, t) per query crosses the host boundary).  The
    # warmup batch is staged in bf16 — the SAME dtype as the timed batches
    # below — so the timed region never recompiles (BENCH_r01.json showed
    # a 13.6 s first-timed-call compile from an f32 warmup).
    f0_np, sources = make_batch(1)
    f0 = jax.device_put(jnp.asarray(f0_np, dtype=jnp.bfloat16))
    (song, sco, t), = engine.search_top1_device(f0)
    hits = int((map_song(song) == np.asarray(sources)).sum())
    assert hits == B, "recall sanity failed: %d/%d" % (hits, B)

    # pre-stage query batches on device: the serving regime keeps queries
    # on-accelerator (they come out of the embedder); this also keeps the
    # sandbox tunnel's slow H2D out of the measurement.  bf16 staging —
    # the engine casts to the db dtype anyway.
    batches = [
        jax.device_put(jnp.asarray(make_batch(10 + i)[0], dtype=jnp.bfloat16))
        for i in range(16)
    ]
    jax.block_until_ready(batches)

    def run_arrs(arrs, M, trial, **skw):
        # every trial rescales the queries by a distinct, exactly-bf16-
        # representable factor: score argmax/timing-relevant compute are
        # unchanged, but the input BYTES differ per trial, so the relay's
        # input-keyed execution cache (CLAUDE.md gotcha) can never serve
        # a repeat trial — min-over-trials stays an honest slope.  The
        # [B,S,d] elementwise scale is HBM-trivial next to the alignment
        # matmul.
        s = jnp.bfloat16(1.0 + trial / 64.0)
        t0 = time.time()
        outs = [engine.search_top1_device(arrs[j] * s, **skw)
                for j in range(M)]
        for o in outs:
            for tr in o:  # per max_batch chunk
                np.asarray(tr[0])  # [B] best-song ids — forces completion
        return time.time() - t0

    def run(M, trial, **skw):
        return run_arrs(batches, M, trial, **skw)

    # the sandbox TPU is a shared tunnel with heavy run-to-run contention
    # (identical code measures 2-5x apart); take the best of several
    # slope estimates as the uncontended throughput
    import sys

    t1s = [run(4, t) for t in range(4)]
    t2s = [run(16, 4 + t) for t in range(4)]
    print(
        "t4(ms): %s  t16(ms): %s"
        % (["%.0f" % (t * 1000) for t in t1s], ["%.0f" % (t * 1000) for t in t2s]),
        file=sys.stderr,
    )
    # slope from the least-contended trials; if noise still swamps the
    # fixed cost, fall back to the conservative per-batch upper bound
    slope = (min(t2s) - min(t1s)) / 12
    if slope <= 0:
        slope = min(t2s) / 16
    qps = B / slope

    result = {
        "metric": "queries_per_sec",
        "value": round(qps, 1),
        "unit": "10s-queries/s/chip",
        "vs_baseline": round(qps / 5000.0, 3),
    }
    if batch_sweep:
        # per-dispatch batch-size scaling curve (VERDICT r2 next #7: the
        # DESIGN.md prose curve as a driver-diffable artifact).  For
        # bs < engine.max_batch the engine's chunk size is lowered to bs
        # so the kernel genuinely compiles/runs at that batch (the
        # pallas kernel takes B from the input shape, any LANE multiple
        # — padding bs up to max_batch would measure 1024-row kernels
        # for every point); for bs > max_batch a dispatch chunks into
        # bs/max_batch pipelined kernel calls.  Every dispatch input is
        # made byte-distinct (device-side slice/concat of distinct
        # staged batches x a per-arr bf16 scale, on top of run_arrs'
        # per-trial scale) so the relay's input-keyed execution cache
        # (CLAUDE.md gotcha) can never serve a repeat.
        trial_at = [12]  # continue past the headline's trial ids

        def next_trial():
            trial_at[0] += 1
            return trial_at[0]

        curve = []
        Bst = batches[0].shape[0]
        orig_mb = engine.max_batch
        for bs in (128, 256, 512, 1024):
            if bs <= Bst:
                base = [batches[i % len(batches)][:bs] for i in range(8)]
            else:
                kk = bs // Bst
                base = [
                    jnp.concatenate(
                        [batches[(i * kk + j) % len(batches)]
                         for j in range(kk)]
                    )
                    for i in range(8)
                ]
            arrs = [a * jnp.bfloat16(1.0 + (i + 1) / 32.0)
                    for i, a in enumerate(base)]
            jax.block_until_ready(arrs)
            engine.max_batch = min(bs, orig_mb)
            try:
                lo = min(run_arrs(arrs, 2, next_trial()) for _ in range(3))
                hi = min(run_arrs(arrs, 8, next_trial()) for _ in range(3))
            finally:
                engine.max_batch = orig_mb
            sl = (hi - lo) / 6
            if sl <= 0:
                sl = hi / 8
            curve.append({"batch": bs, "qps": round(bs / sl, 1)})
        result["batch_curve"] = curve
    if sharded:
        result["mode"] = "sharded-1shard"
    if scale:
        result["mode"] = "screened-int8exact" if int8_exact else "screened"
        result["n_songs"] = n_songs
        result["recall_sanity"] = "%d/%d" % (hits, B)
        if int8_exact:
            # int8-exact keeps the host-gated stage 3 (the whole-chunk
            # fused rescue's int32 score tensor is beyond the cap at
            # this scale), so the headline above is the bare screened
            # path; rescue correctness is pinned by tests/test_screen.py
            result["rescue_path"] = "host-gated"
            try:
                ms = jax.devices()[0].memory_stats() or {}
                result["hbm_bytes_in_use"] = int(ms.get("bytes_in_use", 0))
            except Exception:
                pass
        else:
            # fused-rescue controls: rescued=False prices the lax.cond
            # gate (headline "value" above IS the rescued path at the
            # 0.1-noise mix); heavy-noise batches (cosine ~0.19, every
            # chunk escalates) price the whole-chunk rescue ceiling
            result["rescue_path"] = "fused-cond"
            engine.search_top1_device(f0, rescued=False)  # warm compile
            t1b = [run(4, 20 + t, rescued=False) for t in range(3)]
            t2b = [run(16, 24 + t, rescued=False) for t in range(3)]
            slb = (min(t2b) - min(t1b)) / 12
            if slb <= 0:
                slb = min(t2b) / 16
            result["bare_top1_qps"] = round(B / slb, 1)
            f1, src1 = make_batch(99, 0.46)
            f1d = jax.device_put(jnp.asarray(f1, jnp.bfloat16))
            (sg, _, _), = engine.search_top1_device(f1d)
            result["recall_noisy"] = "%d/%d" % (
                int((map_song(sg) == np.asarray(src1)).sum()), B)
            noisy = [
                jax.device_put(jnp.asarray(make_batch(40 + i, 0.46)[0],
                                           jnp.bfloat16))
                for i in range(16)
            ]
            jax.block_until_ready(noisy)
            t1n = [run_arrs(noisy, 4, 30 + t) for t in range(3)]
            t2n = [run_arrs(noisy, 16, 34 + t) for t in range(3)]
            sln = (min(t2n) - min(t1n)) / 12
            if sln <= 0:
                sln = min(t2n) / 16
            result["rescued_top1_qps_noisy"] = round(B / sln, 1)
        print(json.dumps(result))
        return
    try:
        result["train_step_ms"] = round(train_step_ms(), 1)
    except Exception as e:  # retrieval is the headline; train bench is extra
        print("train bench failed: %r" % (e,), file=sys.stderr)
    print(json.dumps(result))


def train_step_ms() -> float:
    """Secondary metric: flagship train-step latency at the reference's
    full 640-pair batch (1280 mel segments, d=128/h=1024/u=32 — the
    batch the reference needs its gradient-cache two-pass trick for,
    train.py:82-97; here it's one jitted DP-able step)."""
    import time

    import jax
    import jax.numpy as jnp

    from pfann_tpu.train.trainer import Trainer

    cfg = {
        "batch_size": 640,
        "sample_rate": 8000,
        "stft_n": 1024,
        "stft_hop": 256,
        "n_mels": 256,
        "f_min": 300,
        "f_max": 4000,
        "segment_size": 1,
        "hop_size": 0.5,
        "epoch": 100,
        "lr": 1e-4,
        "tau": 0.05,
        "cutout_min": 0.1,
        "cutout_max": 0.5,
        "model": {"d": 128, "h": 1024, "u": 32, "fuller": True},
    }
    trainer = Trainer(cfg, compute_dtype=jnp.bfloat16)
    params, opt_state = trainer.init_state()
    rng = np.random.default_rng(7)
    # distinct pre-staged batches (relay caches identical inputs)
    xs = [
        jax.device_put(
            jnp.asarray(rng.random((1280, 256, 32), dtype=np.float32))
        )
        for i in range(8)
    ]
    jax.block_until_ready(xs)
    key = jax.random.key(0)

    def chain(n, params, opt_state):
        t0 = time.time()
        loss = None
        for i in range(n):
            params, opt_state, loss = trainer.train_step(
                params, opt_state, xs[i % len(xs)], key
            )
        np.asarray(loss)  # device->host transfer is the reliable sync
        return time.time() - t0, params, opt_state

    _, params, opt_state = chain(1, params, opt_state)  # compile
    t2, params, opt_state = chain(2, params, opt_state)
    t8, params, opt_state = chain(8, params, opt_state)
    return max((t8 - t2) / 6, 1e-9) * 1000


def sustained_train(config_path: str) -> None:
    """Sustained training throughput: ONE real epoch off the memmap
    cache — host pipeline (SegmentedDataLoader workers + two-stage
    shuffle) feeding the jitted device step (aug + SpecAugment + fwd +
    bwd).  This is the regime where the reference is CPU-bound in its
    aug chain (SURVEY §3.1); segments/s proves the host keeps the chip
    fed, which train_step_ms alone cannot (VERDICT r2 weak #7).
    Epoch 1 is used (epoch 0 pays preprocess-cache builds)."""
    import time

    from pfann_tpu.data.segments import SegmentedDataLoader
    from pfann_tpu.train.trainer import Trainer
    from pfann_tpu.utils import read_config

    params = read_config(config_path)
    loader = SegmentedDataLoader("train", params, num_workers=2)
    trainer = Trainer(params)
    p, o = trainer.init_state()
    p, o, _ = trainer.train_epoch(p, o, loader, epoch=0)  # warm: caches+jit
    n_segments = 2 * len(loader.dataset)  # org + aug per sample
    t0 = time.time()
    p, o, loss = trainer.train_epoch(p, o, loader, epoch=1)
    dt = time.time() - t0
    st = dict(loader.last_stats)
    print(json.dumps({
        "metric": "train_segments_per_sec",
        "value": round(n_segments / dt, 1),
        "unit": "segments/s/chip (host pipeline + device step)",
        "epoch_s": round(dt, 1),
        "n_segments": n_segments,
        "loss": round(float(loss), 4),
        # phase split (VERDICT r3 next #3): host cue/gather work vs
        # device-call dispatch inside the producer thread; the residual
        # (epoch_s - host_s - dispatch_s) is device compute + tunnel
        # sync absorbed by the consumer
        "host_s": round(st.get("host_s", 0.0), 2),
        "dispatch_s": round(st.get("dispatch_s", 0.0), 2),
        "device_corpus": loader._corpus_dev is not None,
    }))


def long_query_bench(n_songs: int = 10_000) -> None:
    """60 s (MIREX-length, S=119 windows) query throughput — the path
    VERDICT r3 flagged as unmeasured.  Serving options benchmarked:

      * screen+align_pad=128: the two-stage engine built with a 128-row
        layout pad (coarse stage ceil(119/4)=30 windows still fits the
        Pallas kernel halo; stage 2 rescores exactly) — the recommended
        long-query serving config.
      * topk: the reference-style per-segment top-k + rerank engine —
        what a default (align_pad-less) DB silently served these queries
        with before round 4 (now it logs the fallback).

    Songs are 120 segments (60 s) so true 119-window alignments exist."""
    import sys

    import jax
    import jax.numpy as jnp

    from pfann_tpu.index.screen import ScreenedAlignmentEngine
    from pfann_tpu.index.search import search_and_rerank

    rng = np.random.default_rng(0)
    segs, d, S = 120, 128, 119
    counts = np.full(n_songs, segs, dtype=np.int64)
    emb = rng.standard_normal((n_songs * segs, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    def make(seed, B):
        r = np.random.default_rng(seed)
        f = np.zeros((B, S, d), np.float32)
        src = []
        for b in range(B):
            song = int(r.integers(0, n_songs))
            q = emb[song * segs :][:S] + 0.1 * r.standard_normal(
                (S, d)
            ).astype(np.float32)
            f[b] = q / np.linalg.norm(q, axis=1, keepdims=True)
            src.append(song)
        return f, src

    def slope_qps(dispatch, batches, B):
        def run(arrs, M, trial):
            s = jnp.bfloat16(1.0 + trial / 64.0)
            t0 = time.time()
            outs = [dispatch(a * s) for a in arrs[:M]]
            for o in outs:
                np.asarray(o[0])
            return time.time() - t0

        lo = min(run(batches, 2, t) for t in range(3))
        hi = min(run(batches, 6, 3 + t) for t in range(3))
        sl = (hi - lo) / 4
        if sl <= 0:
            sl = hi / 6
        return B / sl

    result = {"metric": "long_query_qps", "unit": "60s-queries/s/chip",
              "S": S, "n_songs": n_songs}

    # --- screened engine with a 128-window layout pad ------------------
    scr = ScreenedAlignmentEngine(
        emb, counts, pad=128, k=4, top_m=32, score_dtype=jnp.bfloat16,
    )
    B = scr._chunk_for(S)
    f0, src = make(1, B)
    f0d = jax.device_put(jnp.asarray(f0, jnp.bfloat16))
    (song, _, _), = scr.search_top1_device(f0d)
    hits = int((np.asarray(song) == np.asarray(src)).sum())
    assert hits == B, "long-query screen recall: %d/%d" % (hits, B)
    batches = [
        jax.device_put(jnp.asarray(make(10 + i, B)[0], jnp.bfloat16))
        for i in range(6)
    ]
    jax.block_until_ready(batches)
    qps = slope_qps(
        lambda a: scr.search_top1_device(a)[0], batches, B
    )
    result["screen_pad128_qps"] = round(qps, 1)
    result["value"] = round(qps, 1)
    result["vs_baseline"] = round(qps / 5000.0, 3)
    del scr, batches
    print("screen_pad128: %.1f q/s (B=%d)" % (qps, B), file=sys.stderr)

    # --- reference-style topk fallback (what an align_pad-less DB uses) -
    from pfann_tpu.utils.fastcast import host_cast

    db = jax.device_put(jnp.asarray(host_cast(emb, jnp.bfloat16)))
    song_pos = jax.device_put(
        jnp.asarray(np.pad(np.cumsum(counts), (1, 0)), jnp.int32)
    )
    Bt = 2  # seq_rerank's [C, J, d] candidate windows bound the batch

    @jax.jit
    def topk_fn(db, song_pos, qpad):
        return jax.vmap(
            lambda q: search_and_rerank(
                db, song_pos, q, jnp.ones((S,), bool), top_k=100,
                n_songs=n_songs, frame_shift_mul=1, backend="approx",
            )
        )(qpad)

    tb = [
        jax.device_put(jnp.asarray(make(30 + i, Bt)[0]))
        for i in range(6)
    ]
    jax.block_until_ready(tb)
    smax, _ = topk_fn(db, song_pos, tb[0])
    hits = int(
        (np.asarray(jnp.argmax(smax, 1)) == np.asarray(make(30, Bt)[1])).sum()
    )
    assert hits == Bt, "topk recall: %d/%d" % (hits, Bt)

    def run_topk(arrs, M, trial):
        s = jnp.float32(1.0 + trial / 64.0)
        t0 = time.time()
        outs = [topk_fn(db, song_pos, a * s) for a in arrs[:M]]
        for o in outs:
            np.asarray(o[0])
        return time.time() - t0

    lo = min(run_topk(tb, 2, t) for t in range(3))
    hi = min(run_topk(tb, 6, 3 + t) for t in range(3))
    sl = (hi - lo) / 4
    if sl <= 0:
        sl = hi / 6
    result["topk_qps"] = round(Bt / sl, 1)
    print(json.dumps(result))


def build_bench(n_songs: int = 1000, seconds: float = 30.0,
                depths: tuple = (8,)) -> None:
    """DB-build throughput on the real chip — the one metric named in
    BASELINE.json ("DB-build fps/sec") never captured before round 4.

    Runs the production build hot loop (builder.build_embeddings: decode
    stream -> packed embed chunks -> raw f32 append) over a synthetic
    WAV corpus at the flagship dims (d=128/h=1024/u=32) and reports
    audio-s/s/chip, embeddings/s, and the host/device phase split.
    Audio content doesn't affect throughput (the chain is
    decode/resample/unfold + mel+conv MACs), so white-noise songs keep
    the bench self-contained.  vs_baseline is against a 1000x-realtime
    target (a 20k-track x 30 s corpus in ~10 min/chip); the reference's
    own builder rate was never published (SURVEY.md section 6)."""
    import shutil
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    from builder import build_embeddings
    from pfann_tpu.audio.io import write_wav
    from pfann_tpu.data.musicdata import MusicDataset
    from pfann_tpu.index.embedder import Embedder
    from pfann_tpu.models.fp_network import build_fp_network
    from pfann_tpu.utils import checkpoint as ckpt

    params = {
        "sample_rate": 8000, "stft_n": 1024, "stft_hop": 256,
        "n_mels": 256, "f_min": 300, "f_max": 4000,
        "segment_size": 1, "hop_size": 0.5,
        "model": {"d": 128, "h": 1024, "u": 32, "fuller": True},
        "indexer": {"top_k": 100, "frame_shift_mul": 1},
    }
    tmp = tempfile.mkdtemp(prefix="pfann_build_bench_")
    try:
        rng = np.random.default_rng(0)
        n = int(params["sample_rate"] * seconds)
        list_path = os.path.join(tmp, "list.txt")
        with open(list_path, "w") as f:
            for i in range(n_songs):
                p = os.path.join(tmp, "t%05d.wav" % i)
                write_wav(p, 0.5 * rng.standard_normal(n).astype(np.float32),
                          params["sample_rate"])
                f.write(p + "\n")

        model = build_fp_network(params, compute_dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((2, model.F, model.T))
        )
        model_path = os.path.join(tmp, "model.msgpack")
        ckpt.save_model(model_path, variables)
        chunk = 2048 if jax.default_backend() == "tpu" else 512
        embedder = Embedder(params, model_path, chunk=chunk)
        # warm the compile outside the measured region
        embedder.embed(np.zeros((chunk, embedder.segment_size), np.float32))

        for depth in depths:
            dataset = MusicDataset(list_path, params)
            t0 = time.time()
            with open(os.path.join(tmp, "embeddings"), "wb") as emb_file:
                out = build_embeddings(
                    embedder, dataset, emb_file,
                    hop_size=params["hop_size"], depth=depth,
                )
            wall = time.time() - t0
            st = out["stats"]
            print(
                "depth %d decode %.1fs embed %.1fs write %.1fs wall %.1fs"
                % (depth, st["decode_s"], st["embed_s"], st["write_s"],
                   wall),
                file=sys.stderr,
            )
            audio_per_s = st["audio_s"] / wall
            print(json.dumps({
                "metric": "db_build_throughput",
                "value": round(audio_per_s, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(audio_per_s / 1000.0, 3),
                "embeddings_per_sec": round(out["total"] / wall, 1),
                "n_songs": n_songs,
                "pipeline_depth": depth,
                "phase_split_s": {
                    "decode": round(st["decode_s"], 2),
                    "embed": round(st["embed_s"], 2),
                    "write": round(st["write_s"], 2),
                    "wall": round(wall, 2),
                },
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def db_bench(db_dir: str) -> None:
    """Retrieval throughput on a REAL built DB directory — the same
    embedding matrix the accuracy harness matches against, not random
    vectors (VERDICT r3 missing #1: the screened engine's q/s and recall
    sanity had only ever been measured on synthetic embeddings).

    Loads <db_dir>/embeddings via Database (engine auto-selects: screen
    at >= 30k songs), draws queries as real in-DB windows + noise, and
    reports the slope-timed q/s for the auto engine AND the exhaustive
    align control on the same matrix."""
    import sys

    import jax
    import jax.numpy as jnp

    from pfann_tpu.index.database import Database
    from pfann_tpu.utils import read_config

    cfg = read_config(os.path.join(db_dir, "configs.json"))
    db = Database(db_dir, cfg["indexer"], cfg.get("hop_size", 0.5))
    emb, counts = db._emb_host, np.diff(db.song_pos)
    n_songs = len(counts)
    S = 19
    starts = db.song_pos[:-1]
    ok = counts >= S + 1
    cand_songs = np.nonzero(ok)[0]

    def make_batch(seed, B, noise=0.1):
        r = np.random.default_rng(seed)
        filters = np.zeros((B, S, db.d), np.float32)
        src = []
        for b in range(B):
            song = int(cand_songs[r.integers(0, cand_songs.shape[0])])
            off = int(r.integers(0, counts[song] - S))
            q = emb[starts[song] + off :][:S].copy()
            q += noise * r.standard_normal((S, db.d)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            filters[b] = q
            src.append(song)
        return filters, src

    def slope_qps(engine, label, seed0, noise=0.1, **skw):
        """Pipelined-dispatch slope throughput of search_top1_device —
        for the screen engine with a rescue cut this is the FUSED
        rescued serving path by default (the lax.cond gate never syncs
        the pipeline); skw={'rescued': False} measures the bare
        stages-1+2 control."""
        B = engine.max_batch if not hasattr(engine, "_chunk_for") \
            else engine._chunk_for(S)
        f0, src = make_batch(seed0, B, noise)
        f0d = jax.device_put(jnp.asarray(f0, jnp.bfloat16))
        (song, _, _), = engine.search_top1_device(f0d, **skw)
        hits = int((np.asarray(song) == np.asarray(src)).sum())
        batches = [
            jax.device_put(
                jnp.asarray(make_batch(seed0 + 1 + i, B, noise)[0],
                            jnp.bfloat16))
            for i in range(8)
        ]
        jax.block_until_ready(batches)

        def run(M, trial):
            s = jnp.bfloat16(1.0 + trial / 64.0)
            t0 = time.time()
            outs = [engine.search_top1_device(batches[j % 8] * s, **skw)
                    for j in range(M)]
            for o in outs:
                np.asarray(o[0][0])
            return time.time() - t0

        lo = min(run(2, t) for t in range(3))
        hi = min(run(8, 3 + t) for t in range(3))
        sl = (hi - lo) / 6
        if sl <= 0:
            sl = hi / 8
        print("%s: recall %d/%d  %.1f q/s" % (label, hits, B, B / sl),
              file=sys.stderr)
        return round(B / sl, 1), hits, B

    def search_qps(noise, seed0, label):
        """The PRODUCTION serving path (engine.search: full song-score
        tables + stage-3 rescue when enabled) at a given query noise —
        clean traffic escalates ~nothing, heavy noise prices the rescue
        ceiling.  Host-inclusive wall time (numpy scatter + host sync),
        slope-timed over distinct batches."""
        B = getattr(db._align, "max_batch", 128)
        B = min(B, 128)
        sub_lens = np.full(B, S, np.int32)

        def noisy_batch(seed):
            r = np.random.default_rng(seed)
            f, _ = make_batch(seed, B)
            f += noise * r.standard_normal(f.shape).astype(np.float32)
            f /= np.linalg.norm(f, axis=2, keepdims=True)
            return f
        batches = [noisy_batch(seed0 + i) for i in range(9)]
        # warm compiles on a batch the measured runs never reuse (the
        # relay caches identical-input executions)
        db._align.search(noisy_batch(seed0 + 999), sub_lens)

        def run(M, at):
            t0 = time.time()
            for j in range(M):
                db._align.search(batches[at + j], sub_lens)
            return time.time() - t0
        lo = min(run(1, t) for t in range(3))
        hi = min(run(3, at) for at in (3, 6))
        sl = max((hi - lo) / 2, 1e-9)
        print("%s: %.1f q/s (host path)" % (label, B / sl), file=sys.stderr)
        return round(B / sl, 1)

    def rescued_top1_qps(noise, seed0, label, ctl):
        """The RESCUED top-1 serving path — the one number that is both
        fast AND exhaustive-parity (VERDICT r4 #1).  Measured PIPELINED
        through search_top1_device: with the fused lax.cond rescue the
        escalation gate lives on device, so clean traffic runs at the
        bare stages-1+2 speed and noisy traffic pays one whole-chunk
        exhaustive rescore instead of a host-gated serialized rescue.
        Parity vs the exhaustive align control is asserted on answers,
        not just recall."""
        qps, _, B = slope_qps(db._align, label, seed0, noise=noise)
        f0, _ = make_batch(seed0 + 99, 512, noise)
        song, _, _ = db._align.search_top1(f0)
        cs = np.concatenate([
            np.asarray(o[0]) for o in ctl.search_top1_device(
                jax.device_put(jnp.asarray(f0, jnp.bfloat16)))
        ])[:512]
        parity = int((song == cs).sum())
        print("%s: parity %d/512 vs align" % (label, parity),
              file=sys.stderr)
        return qps, "%d/512" % parity

    res = {"metric": "db_queries_per_sec", "unit": "10s-queries/s/chip",
           "n_songs": n_songs, "db": os.path.basename(db_dir.rstrip("/")),
           "engine": db.engine}
    qps, hits, B = slope_qps(db._align, db.engine, 100)
    res["value"] = qps
    res["vs_baseline"] = round(qps / 5000.0, 3)
    res["recall_sanity"] = "%d/%d" % (hits, B)
    if db.engine == "screen":
        from pfann_tpu.index.align import AlignmentEngine

        ctl = AlignmentEngine(emb, counts, score_dtype=jnp.bfloat16,
                              pad=db._align.pad)
        qps2, hits2, B2 = slope_qps(ctl, "align-control", 200)
        res["align_control_qps"] = qps2
        res["align_control_recall"] = "%d/%d" % (hits2, B2)
        if db._align._rescue_tau is not None:
            # RESCUED top-1 serving (the validated fast path): clean mix
            # (cosine ~0.66, ~zero escalation) and the heavy-noise
            # ceiling (cosine ~0.19, ~full escalation).  The clean
            # number becomes the headline "value" — it is the engine a
            # production top-1 API would actually run, and its answers
            # are exhaustive-parity by construction.  The bare
            # stages-1+2 control (rescued=False) prices the fused
            # lax.cond gate itself.
            bare, _, _ = slope_qps(db._align, "bare-top1", 700,
                                   rescued=False)
            r1c, p1c = rescued_top1_qps(0.05, 500, "rescued-top1-clean",
                                        ctl)
            r1n, p1n = rescued_top1_qps(0.46, 600, "rescued-top1-noisy",
                                        ctl)
            res["bare_top1_qps"] = bare
            res["value"] = r1c
            res["vs_baseline"] = round(r1c / 5000.0, 3)
            res["rescued_top1_qps_clean"] = r1c
            res["rescued_top1_parity_clean"] = p1c
            res["rescued_top1_qps_noisy"] = r1n
            res["rescued_top1_parity_noisy"] = p1n
            # production search() path: full [B, n_songs] tables (the
            # matcher .bin contract) — D2H-bound, kept for reference
            res["rescued_search_qps_clean"] = search_qps(0.05, 300, "rescued-clean")
            res["rescued_search_qps_noisy"] = search_qps(0.46, 400, "rescued-noisy")
    print(json.dumps(res))


def landmark_bench(n_songs: int = 64, seconds: float = 30.0) -> None:
    """Landmark (constellation) extraction throughput: the accelerator-
    batched front end (landmark/device.py — framed DFT + reduce_window
    local-max + sort-median on device, int16 in / bit-packed masks out)
    vs the numpy reference path, plus the hash agreement between them
    (ulp-level FFT differences can flip peaks sitting exactly on the
    median gate; parity is bit-exact on the CPU backend, measured here
    on the real chip).  VERDICT r3 next #7: >= 4x the 348 audio-s/s/core
    host rate with the same hashes."""
    import sys

    from pfann_tpu.landmark.core import extract_hashes, pair_peaks
    from pfann_tpu.landmark.device import DevicePeakExtractor, as_device_input

    rng = np.random.default_rng(0)
    sr, n = 8000, int(8000 * seconds)

    def song(seed):
        r = np.random.default_rng(seed)
        out = 0.01 * r.standard_normal(n).astype(np.float32)
        t = 0
        while t < n:
            dur = min(int(sr * r.uniform(0.1, 0.4)), n - t)
            tt = np.arange(dur, dtype=np.float32) / sr
            tone = np.sin(2 * np.pi * r.uniform(100, 3500) * tt)
            out[t : t + dur] += (r.uniform(0.3, 0.8) * tone
                                 * np.exp(-tt * 20)).astype(np.float32)
            t += dur + int(sr * r.uniform(0.05, 0.2))
        out = 0.6 * out / max(float(np.abs(out).max()), 1e-9)
        # int16-quantize: the decoded-WAV regime (half the tunnel bytes)
        return (np.clip(out, -1, 1) * 32767).astype(np.int16)

    wavs = [song(i) for i in range(n_songs)]
    dev_in = [as_device_input(w.astype(np.float32) / 32768) for w in wavs]
    assert dev_in[0].dtype == np.int16
    ex = DevicePeakExtractor()
    # compile warm-up on DISTINCT songs of the measured batch size: the
    # measured batches must never repeat warm-up bytes (the relay caches
    # identical-input executions — an equal-length corpus keeps
    # extract()'s stable sort in input order, so dev_in[:batch] would be
    # byte-identical to call one), and the warm-up shape must match or
    # the first measured call pays the compile instead
    ex.extract([song(n_songs + i) for i in range(min(n_songs, ex.batch))])
    t0 = time.time()
    dev_peaks = ex.extract(dev_in)
    t_dev = time.time() - t0
    t0 = time.time()
    host = [extract_hashes(w.astype(np.float32) / 32768) for w in wavs]
    t_host = time.time() - t0
    agree_n = tot = 0
    for (hh, ht), pk in zip(host, dev_peaks):
        hd, td = pair_peaks(pk)
        a = set(zip(hh.tolist(), ht.tolist()))
        b = set(zip(hd.tolist(), td.tolist()))
        agree_n += len(a & b)
        tot += max(len(a), len(b), 1)
    audio_s = n_songs * seconds
    print("device %.1fs host %.1fs agree %d/%d"
          % (t_dev, t_host, agree_n, tot), file=sys.stderr)
    print(json.dumps({
        "metric": "landmark_extract_throughput",
        "value": round(audio_s / t_dev, 1),
        "unit": "audio-s/s/chip (device front end)",
        "host_audio_s_per_sec": round(audio_s / t_host, 1),
        "speedup": round(t_host / t_dev, 2),
        "hash_agreement": round(agree_n / max(tot, 1), 6),
        "n_songs": n_songs,
    }))


def _wait_for_backend(retries: int = 5, delay_s: float = 120.0) -> None:
    """The tunneled TPU relay sporadically reports UNAVAILABLE for
    10+ minutes (observed during round 3).  The driver runs this script
    once at round end — wait for the relay instead of losing the round's
    benchmark artifact to a transient outage.  Probe in a SUBPROCESS
    (jax caches a failed backend init in-process) and only init the
    in-process backend once a probe succeeds."""
    import os
    import subprocess
    import sys

    if os.environ.get("PFANN_PLATFORM", "").startswith("cpu"):
        return  # CPU-forced dev runs never wait on the relay
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=1200,
            )
            ok, err = r.returncode == 0, r.stderr.decode()[-400:]
        except subprocess.TimeoutExpired:
            # a HUNG probe (relay black-holes instead of erroring) is a
            # failed attempt, not a crash
            ok, err = False, "probe timed out after 1200s"
        if ok:
            return
        if attempt == retries - 1:
            sys.stderr.write(err + "\n")
            raise RuntimeError("backend unavailable after %d probes" % retries)
        print(
            "backend probe failed; retry %d/%d in %.0fs"
            % (attempt + 1, retries, delay_s),
            file=sys.stderr,
        )
        time.sleep(delay_s)


if __name__ == "__main__":
    import sys as _sys

    _wait_for_backend()
    if "--long" in _sys.argv:
        at = _sys.argv.index("--long")
        n = (int(_sys.argv[at + 1]) if len(_sys.argv) > at + 1
             and _sys.argv[at + 1].isdigit() else 10_000)
        long_query_bench(n)
        _sys.exit(0)
    if "--db" in _sys.argv:
        db_bench(_sys.argv[_sys.argv.index("--db") + 1])
        _sys.exit(0)
    if "--lm" in _sys.argv:
        at = _sys.argv.index("--lm")
        n = (int(_sys.argv[at + 1]) if len(_sys.argv) > at + 1
             and _sys.argv[at + 1].isdigit() else 64)
        landmark_bench(n)
        _sys.exit(0)
    if "--build" in _sys.argv:
        at = _sys.argv.index("--build")
        n = (int(_sys.argv[at + 1]) if len(_sys.argv) > at + 1
             and _sys.argv[at + 1].isdigit() else 1000)
        depths = (8,)
        if "--depth-sweep" in _sys.argv:
            depths = (1, 2, 4, 8, 16)
        elif "--depth" in _sys.argv:
            depths = (int(_sys.argv[_sys.argv.index("--depth") + 1]),)
        build_bench(n, depths=depths)
        _sys.exit(0)
    if "--train-epoch" in _sys.argv:
        at = _sys.argv.index("--train-epoch")
        cfg = (_sys.argv[at + 1] if len(_sys.argv) > at + 1
               else "configs/synth.json")
        sustained_train(cfg)
        _sys.exit(0)
    _scale = 0
    if "--scale" in _sys.argv:
        at = _sys.argv.index("--scale")
        if at + 1 >= len(_sys.argv):
            _sys.exit("usage: bench.py --scale <n_songs>[k]  (e.g. --scale 100k)")
        arg = _sys.argv[at + 1]
        _scale = int(arg[:-1]) * 1000 if arg.endswith("k") else int(arg)
    main(
        sharded="--sharded" in _sys.argv,
        scale=_scale,
        batch_sweep="--batch-sweep" in _sys.argv,
        int8_exact="--int8-exact" in _sys.argv,
    )
