"""Waveform -> fingerprint embedding pipeline for builder/matcher.

Fuses the mel front-end and the encoder into one jitted program (the
reference runs torchaudio mel then the torch model per 16/32-row chunk,
builder.py:88-100 / matcher.py:110-128).  Chunks are padded to a fixed
size so every call reuses one compiled executable.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pfann_tpu.models.fp_network import build_fp_network
from pfann_tpu.ops.melspec import build_mel_spec_layer
from pfann_tpu.utils import checkpoint as ckpt


class Embedder:
    def __init__(
        self,
        params: dict[str, Any],
        model_path: str,
        compute_dtype=jnp.bfloat16,
        chunk: int = 512,
        bucket: bool | None = None,
    ):
        self.model = build_fp_network(params, compute_dtype=compute_dtype)
        self.mel = build_mel_spec_layer(params)
        self.chunk = chunk
        # Ragged-tail padding policy.  On CPU (tests, e2e CLIs) padding is
        # real single-core compute, so pad the tail only up to the next
        # power-of-two bucket (each bucket is one cached compile).  On the
        # TPU a recompile costs 10 s - minutes through the remote relay
        # and padded rows are nearly free on the MXU, so always pad to the
        # one fixed chunk shape.
        if bucket is None:
            bucket = jax.default_backend() != "tpu"
        self.bucket = bucket
        self.d = self.model.d
        self.segment_size = int(params["segment_size"] * params["sample_rate"])
        # Only the pytree STRUCTURE is needed to deserialize the
        # checkpoint; eval_shape skips init's compute entirely (eager
        # flax init costs ~17 s of un-cacheable tiny op compiles on the
        # single-core CPU backend the e2e CLIs run on).
        target = jax.eval_shape(
            lambda: self.model.init(
                jax.random.key(0), jnp.zeros((1, self.model.F, self.model.T))
            )
        )
        # Pin the weights on device ONCE: from_bytes returns host numpy
        # arrays, and a host-resident pytree argument is re-uploaded on
        # EVERY jitted call — through the tunneled TPU that is ~68 MB
        # (flagship f32) per embed dispatch at ~13 MB/s, i.e. ~5 s/call,
        # and it was the entire "embed-dispatch-bound" DB-build wall of
        # BENCH_r04_build.json (420 audio-s/s; device-put lifts the same
        # build >4x).  Device arrays are hashed by handle, not content,
        # so subsequent dispatches ship only the audio payload.
        self.variables = jax.device_put(ckpt.load_model(model_path, target))
        mel, model = self.mel, self.model

        @jax.jit
        def _embed(variables, wav):
            return model.apply(variables, mel(wav), norm=True)

        @jax.jit
        def _embed_saliency(variables, wav):
            # reference matcher.py:118-128: forward with norm=False, pull
            # the gradient of ||z||^2/2 back to the mel input (cotangent
            # z), then L2-normalize z for the search
            g = mel(wav)
            z, vjp = jax.vjp(
                lambda gg: model.apply(variables, gg, norm=False), g
            )
            (dg,) = vjp(z)
            z = z / jnp.maximum(
                jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12
            )
            return z, dg, g

        self._embed = _embed
        self._embed_saliency = _embed_saliency
        self._songs_fns: dict[tuple, Any] = {}

    def _pad_to(self, n: int) -> int:
        """Padded row count for an n-row (ragged) chunk."""
        from pfann_tpu.index.search import bucket_tail_rows

        return bucket_tail_rows(n, self.chunk, self.bucket)

    def embed(self, wav: np.ndarray) -> np.ndarray:
        """wav: [S, segment_size] float32 -> [S, d] float32 L2-normalized."""
        S = wav.shape[0]
        if S == 0:
            return np.zeros((0, self.d), dtype=np.float32)
        outs, lens = [], []
        for i in range(0, S, self.chunk):
            part = wav[i : i + self.chunk]
            n = part.shape[0]
            target = self._pad_to(n)
            if n < target:
                part = np.concatenate(
                    [part, np.zeros((target - n, wav.shape[1]), wav.dtype)]
                )
            # dispatch every chunk before syncing any: the D2H transfer
            # is the per-call fixed cost on the tunneled TPU (~0.1-1 s),
            # so a blocking np.asarray per chunk serializes RTTs
            outs.append(self._embed(self.variables, jnp.asarray(part)))
            lens.append(n)
        return np.concatenate(
            [np.asarray(y)[:n] for y, n in zip(outs, lens)]
        )

    # ------------------------------------------------ packed-song path
    def can_pack(self, hop: int) -> bool:
        """The device unfold is a hop-reshape: it needs hop | segment."""
        return hop > 0 and self.segment_size % hop == 0

    def _songs_fn(self, B: int, L: int, hop: int):
        """Jitted packed-song program: [B, L] raw audio -> [B, T, d]
        embeddings, with the unfold (overlap expansion) and per-segment
        de-mean ON DEVICE.  Raw audio is 1/(2*overlap) the bytes of the
        host-unfolded f32 segment matrix (4x at hop=segment/2 with int16
        staging) — the H2D transfer is the build pipeline's bottleneck
        on a tunneled chip, not the MXU work."""
        key = (B, L, hop)
        if key in self._songs_fns:
            return self._songs_fns[key]
        import jax

        seg = self.segment_size
        k = seg // hop
        T = L // hop - (k - 1)
        mel, model = self.mel, self.model

        @jax.jit
        def fn(variables, a):
            # int16 and float32 inputs each get their own compile (the
            # dtype is part of the jit signature) — a shared two-carrier
            # signature would H2D a dead [B, L] zeros buffer every call,
            # which is exactly the transfer this path exists to avoid
            x = (a.astype(jnp.float32) / 32768.0
                 if a.dtype == jnp.int16 else a)
            hops = x.reshape(B, L // hop, hop)
            frames = jnp.concatenate(
                [hops[:, i : i + T] for i in range(k)], axis=2
            )  # [B, T, seg] — torch.unfold semantics (complete windows)
            frames = frames - frames.mean(axis=2, keepdims=True)
            z = model.apply(
                variables, mel(frames.reshape(B * T, seg)), norm=True
            )
            return z.reshape(B, T, -1)

        self._songs_fns[key] = fn
        return fn

    def embed_songs_device(
        self, signals: list[np.ndarray], counts: list[int], hop: int,
        pad_b: int | None = None,
    ):
        """Dispatch one packed batch of whole songs; returns a device
        handle (no host sync — callers pipeline decode of the next batch
        against this one's RTT) to pass to :meth:`gather_songs`.
        signals: mono int16 (exact-scale) or float32; counts: complete
        windows per song; pad_b pins the batch dim so ragged tails reuse
        the compiled program."""
        assert self.can_pack(hop)
        B = max(pad_b or 0, len(signals))
        seg = self.segment_size
        need = max(
            (c - 1) * hop + seg if c > 0 else 0 for c in counts
        ) if counts else seg
        L = -(-max(need, seg) // seg) * seg  # bucket to whole segments
        all_i16 = all(s.dtype == np.int16 for s in signals)
        buf = np.zeros((B, L), np.int16 if all_i16 else np.float32)
        for b, s in enumerate(signals):
            n = min(s.shape[0], L)
            if all_i16:
                buf[b, :n] = s[:n]
            elif s.dtype == np.int16:
                # mixed batch rides the f32 carrier: rescale int16
                # sources here (the device fn only divides when the
                # whole buffer is int16)
                buf[b, :n] = s[:n].astype(np.float32) / 32768.0
            else:
                buf[b, :n] = np.asarray(s[:n], np.float32)
        fn = self._songs_fn(B, L, hop)
        return fn(self.variables, jnp.asarray(buf)), list(counts)

    def gather_songs(self, handle) -> list[np.ndarray]:
        """Sync a dispatched packed batch -> per-song [n_i, d] float32."""
        dev, counts = handle
        z = np.asarray(dev, dtype=np.float32)
        return [z[b, : counts[b]] for b in range(len(counts))]

    def embed_songs(
        self, signals: list[np.ndarray], counts: list[int], hop: int
    ) -> list[np.ndarray]:
        """Convenience dispatch+gather (see embed_songs_device), split
        into window-budget-bounded device calls: callers batch by ITEM
        count (matcher --batch), but device memory scales with TOTAL
        windows x model activations — 128 packed 60 s queries is 15,232
        segments, a 22 GB XLA program that OOMs 16 GB HBM (measured).
        chunk*4 windows (~2k at the default 512) keeps the conv stack
        under ~4.5 GB beside a resident DB layout.  Groups share one
        padded batch shape (pad_b=G) so the relay compiles each (G, L)
        bucket once."""
        if not signals:
            return []
        budget = self.chunk * 4
        G = max(1, budget // max(max(counts), 1))
        if len(signals) <= G:
            return self.gather_songs(
                self.embed_songs_device(signals, counts, hop)
            )
        out: list[np.ndarray] = []
        for j in range(0, len(signals), G):
            out.extend(self.gather_songs(self.embed_songs_device(
                signals[j : j + G], counts[j : j + G], hop, pad_b=G,
            )))
        return out

    def embed_stream(self, dataset, hop: int, num_workers: int = 4,
                     depth: int = 2, stats: dict | None = None):
        """Decode -> packed pipelined embed over a MusicDataset: yields
        (index, name, z [n, d] float32) in list order; errors yield a
        [0, d] array.  Device dispatches run `depth` batches ahead of
        the consumer, so the next batch decodes during the current
        one's round trip.  stats (optional dict) accumulates the
        decode_s/embed_s phase split.  Requires can_pack(hop)."""
        import collections

        assert self.can_pack(hop)
        st = stats if stats is not None else {}
        st.setdefault("decode_s", 0.0)
        st.setdefault("embed_s", 0.0)
        inflight: collections.deque = collections.deque()
        pending: list[tuple[int, str, np.ndarray, int]] = []
        group_b = 0

        def dispatch(pin: bool = False):
            nonlocal group_b
            if not pending:
                return
            tm = time.time()
            # pin the padded batch dim only from a FULL chunk-threshold
            # dispatch: an early error/final flush of 1-3 songs must not
            # lock every later call to that tiny batch (each device call
            # pays a 60-150 ms fixed tunnel RTT)
            if pin and not group_b:
                group_b = len(pending)
            handle = self.embed_songs_device(
                [p[2] for p in pending], [p[3] for p in pending], hop,
                pad_b=group_b or None,
            )
            inflight.append((handle, list(pending)))
            pending.clear()
            st["embed_s"] += time.time() - tm

        def drain():
            handle, meta = inflight.popleft()
            tm = time.time()
            zs = self.gather_songs(handle)
            st["embed_s"] += time.time() - tm
            for (i, name, _, _), z in zip(meta, zs):
                yield i, name, z

        tm_decode = time.time()
        # prefetch window: ~depth+1 dispatch batches of songs so decode
        # stays ahead of every in-flight device round trip without
        # buffering the corpus (chunk segments / ~60 per song is a good
        # proxy for songs per dispatch batch)
        for i, name, sig, n_seg in dataset.iterate_raw(
            num_workers=num_workers,
            prefetch=max(
                4 * num_workers, (depth + 1) * max(self.chunk // 40, 1)
            ),
        ):
            st["decode_s"] += time.time() - tm_decode
            if n_seg <= 0:
                # flush so the error row is yielded in list order
                dispatch()
                while inflight:
                    yield from drain()
                yield i, name, np.zeros((0, self.d), np.float32)
            else:
                pending.append((i, name, sig, int(n_seg)))
                if sum(p[3] for p in pending) >= self.chunk or (
                    group_b and len(pending) >= group_b
                ):
                    dispatch(pin=True)
                while len(inflight) > depth:
                    yield from drain()
            tm_decode = time.time()
        dispatch()
        while inflight:
            yield from drain()

    def embed_with_saliency(
        self, wav: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Like :meth:`embed`, additionally returning the mel-input
        gradients and mel spectrograms ([S, F, T] each) for saliency
        rendering (pfann_tpu/index/saliency.py)."""
        S = wav.shape[0]
        F, T = self.model.F, self.model.T
        if S == 0:
            z = np.zeros((0, self.d), dtype=np.float32)
            return z, np.zeros((0, F, T), np.float32), np.zeros((0, F, T), np.float32)
        zs, gs, ms = [], [], []
        for i in range(0, S, self.chunk):
            part = wav[i : i + self.chunk]
            n = part.shape[0]
            target = self._pad_to(n)
            if n < target:
                part = np.concatenate(
                    [part, np.zeros((target - n, wav.shape[1]), wav.dtype)]
                )
            z, dg, g = self._embed_saliency(self.variables, jnp.asarray(part))
            zs.append(np.asarray(z, np.float32)[:n])
            gs.append(np.asarray(dg, np.float32)[:n])
            ms.append(np.asarray(g, np.float32)[:n])
        return np.concatenate(zs), np.concatenate(gs), np.concatenate(ms)
