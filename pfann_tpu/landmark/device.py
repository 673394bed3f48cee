"""TPU-batched constellation extraction for the landmark system.

The landmark front end (log-STFT -> local-max -> median gate,
core.py:51-78) is the same framed-spectrogram shape as the NN's mel
front end (ops/melspec.py) and was the system's single-core hot loop:
348 audio-s/s/core means ~22 core-hours for an fma_full-scale corpus
(VERDICT r3 next #7).  This module runs that front end on the
accelerator for a BATCH of songs per device call and returns the peak
constellations; hash pairing stays on host (pair_peaks is vectorized
and cheap at real peak densities).

Numerical contract vs the numpy reference (core.spectrogram /
core.find_peaks):

  * the audio enters as int16 (the WAV decoder's native samples) and is
    scaled by 1/32768 on device — a power-of-2 divide, so the f32 frame
    values are BIT-IDENTICAL to the host pipeline's when no resampling
    happened; float inputs (resampled audio) are shipped as f32 and are
    likewise bit-identical;
  * the local-max test is `spec == reduce_window(max)` with -inf edge
    padding, which equals scipy's maximum_filter(mode="nearest") for a
    max filter: whenever the centered window straddles the border, the
    border pixel itself is inside the clipped window, so replicating it
    (scipy "nearest") never changes the max;
  * the only inexact step is the FFT (XLA's vs numpy's pocketfft, ulp
    differences) feeding the `spec > median + MIN_GAIN` gate — a peak
    sitting within float noise of the gate can flip.  Measured on the
    synth corpus this moves well under 0.1% of hashes (see
    tests/test_landmark_device.py); the voting histogram is unaffected.

Transfer budget (the sandbox tunnel measures ~25 MB/s H2D, ~17 MB/s
D2H): int16 audio in (0.48 MB per 30 s song), bit-packed peak masks out
(spec.size/8 bytes ~ 60 KB per song), so a 32-song batch moves ~17 MB
total per call — the device compute (DFT + reduce_window + sort) is
noise next to it.
"""

from __future__ import annotations

import numpy as np

from pfann_tpu.utils.fastcast import int16_if_exact as as_device_input
from .core import HOP, MIN_GAIN, N_FFT, NEIGH_F, NEIGH_T


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m




class DevicePeakExtractor:
    """Batched on-device spectrogram + constellation extraction.

    extract(wavs) -> list of peak arrays [(f, t)] int32, time-sorted —
    the exact return contract of core.find_peaks(core.spectrogram(wav)).
    """

    def __init__(self, batch: int = 32, pipeline: int = 4):
        import jax

        self.batch = batch
        # dispatch depth: keep `pipeline` chunks in flight before draining
        # the oldest — the same RTT-hiding pattern as the builder's embed
        # dispatch (builder.py) and bench.py's serving loop.  The tunnel's
        # fixed per-call sync cost (~60-150 ms) plus H2D/D2H latency is
        # otherwise paid serially per chunk; depth 4 bounds in-flight host
        # buffers to ~4 * 15 MB.
        self.pipeline = max(1, pipeline)
        self._jit_cache: dict[int, object] = {}
        self._jax = jax

    # ------------------------------------------------------------ jit
    def _make_fn(self):
        """Jitted [B, L] audio -> packed peak mask [B, F, ceil(T/8)]
        uint8; T and B come from the input shapes (one compile per
        (frame-bucket, batch) pair)."""
        import jax
        import jax.numpy as jnp

        F = N_FFT // 2 + 1

        def fn(audio, valid_frames):
            # audio: [B, L] int16 or float32 — each dtype gets its own
            # compile (a shared two-carrier signature would H2D a dead
            # [B, L] zeros buffer every call, defeating the int16
            # transfer saving)
            x = (audio.astype(jnp.float32) / 32768.0
                 if audio.dtype == jnp.int16 else audio)
            B, L = x.shape
            T = L // HOP - (N_FFT // HOP - 1)  # frames the layout holds
            # frame via hop-reshape: frames[b, t] = hops[b, t:t+4]
            hops = x.reshape(B, L // HOP, HOP)
            frames = jnp.concatenate(
                [hops[:, i : i + T] for i in range(N_FFT // HOP)], axis=2
            )  # [B, T, N_FFT]
            win = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
            spec = jnp.log(
                jnp.abs(jnp.fft.rfft(frames * win, axis=2)) + 1e-6
            )  # [B, T, F]
            tmask = (jnp.arange(T)[None, :] < valid_frames[:, None])
            spec = jnp.where(tmask[:, :, None], spec, -jnp.inf)
            # local max over (freq NEIGH_F, time NEIGH_T); -inf edge
            # padding == scipy mode="nearest" for max (see module doc)
            mx = jax.lax.reduce_window(
                spec, -jnp.inf, jax.lax.max,
                window_dimensions=(1, NEIGH_T, NEIGH_F),
                window_strides=(1, 1, 1),
                padding=((0, 0), (NEIGH_T // 2, NEIGH_T // 2),
                         (NEIGH_F // 2, NEIGH_F // 2)),
            )
            # median over each song's VALID cells: sort with +inf fill,
            # then average the two middle order statistics (numpy's
            # even-count convention; odd picks the middle twice)
            flat = jnp.where(tmask[:, :, None], spec, jnp.inf).reshape(B, -1)
            srt = jnp.sort(flat, axis=1)
            n_valid = valid_frames * F
            i_hi = n_valid // 2
            i_lo = (n_valid - 1) // 2
            med = (jnp.take_along_axis(srt, i_lo[:, None], axis=1)
                   + jnp.take_along_axis(srt, i_hi[:, None], axis=1))[:, 0] / 2
            gate = med + MIN_GAIN
            mask = (spec == mx) & (spec > gate[:, None, None])  # [B, T, F]
            # [B, F, T] bit-packed along time (np.unpackbits order: MSB
            # first within each byte)
            mask = mask.transpose(0, 2, 1)
            Tp = _ceil_to(T, 8)
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Tp - T)))
            bits = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            packed = (mask.reshape(B, F, Tp // 8, 8).astype(jnp.uint8)
                      * bits[None, None, None, :]).sum(axis=3, dtype=jnp.uint8)
            return packed

        return jax.jit(fn, static_argnames=())

    # -------------------------------------------------------- public
    def _bucket(self, n_frames: int) -> int:
        """Frame-count bucket: multiples of 64 frames (~2 s) bound the
        number of distinct compiles while wasting <2 s of pad compute."""
        return max(_ceil_to(n_frames, 64), 64)

    def extract(self, wavs: list[np.ndarray]) -> list[np.ndarray]:
        """Peak constellations for a list of mono signals (int16 or
        float32; int16 is preferred — half the tunnel bytes and
        bit-identical scaling).  Short signals (< N_FFT samples) take
        the host path's zero-pad semantics."""
        jax = self._jax
        out: list[np.ndarray | None] = [None] * len(wavs)
        jobs = []  # (orig_i, wav, n_frames)
        for i, w in enumerate(wavs):
            w = np.asarray(w).reshape(-1)
            if w.shape[0] < N_FFT:
                w = np.pad(w, (0, N_FFT - w.shape[0]))
            jobs.append((i, w, 1 + (w.shape[0] - N_FFT) // HOP))
        # batch by frame bucket so one jitted shape serves the batch;
        # pipelined dispatch — up to self.pipeline chunks in flight, so
        # chunk k+1's H2D overlaps chunk k's compute + D2H instead of
        # paying the tunnel round trip serially (VERDICT r4 weak #7: the
        # device front end was transfer-RTT-bound at ~2x the host path)
        jobs.sort(key=lambda j: j[2])
        pending: list[tuple[list, object]] = []
        for at in range(0, len(jobs), self.batch):
            chunk = jobs[at : at + self.batch]
            pending.append((chunk, self._dispatch_chunk(chunk)))
            if len(pending) >= self.pipeline:
                self._drain_chunk(*pending.pop(0), out)
        while pending:
            self._drain_chunk(*pending.pop(0), out)
        return out  # type: ignore[return-value]

    def _dispatch_chunk(self, chunk):
        """Stage a chunk's host buffer and launch the device call;
        returns the un-synced device result (sync happens in
        _drain_chunk via the D2H transfer — the tunneled backend only
        reliably blocks on np.asarray, see CLAUDE.md)."""
        import jax.numpy as jnp

        jax = self._jax
        B = len(chunk)
        Tb = self._bucket(max(j[2] for j in chunk))
        L = (Tb + (N_FFT // HOP - 1)) * HOP
        all_i16 = all(j[1].dtype == np.int16 for j in chunk)
        buf = np.zeros((B, L), np.int16 if all_i16 else np.float32)
        valid = np.zeros(B, np.int32)
        for b, (_, w, nf) in enumerate(chunk):
            # clip to the bucketed buffer: when Tb == nf exactly (max
            # frame count on the bucket boundary) a signal with
            # remainder samples past its last complete frame is longer
            # than L; those samples never belong to a complete frame,
            # so dropping them preserves peak parity (same clip as
            # Embedder.embed_songs_device, embedder.py:174)
            n = min(w.shape[0], L)
            if all_i16:
                buf[b, :n] = w[:n]
            elif w.dtype == np.int16:
                # mixed chunk rides the f32 carrier: rescale int16
                # sources here (the device fn only divides when the
                # whole buffer is int16)
                buf[b, :n] = w[:n].astype(np.float32) / 32768.0
            else:
                buf[b, :n] = w[:n].astype(np.float32)
            valid[b] = nf
        key = (Tb, B)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._make_fn()
        fn = self._jit_cache[key]
        return fn(jnp.asarray(buf), jnp.asarray(valid))

    def _drain_chunk(self, chunk, dev_packed, out) -> None:
        packed = np.asarray(dev_packed)  # D2H — the reliable sync point
        for b, (i, _, nf) in enumerate(chunk):
            mask = np.unpackbits(packed[b], axis=1)[:, :nf].astype(bool)
            f, t = np.nonzero(mask)  # row-major == find_peaks' nonzero
            order = np.argsort(t, kind="stable")
            out[i] = np.stack([f[order], t[order]], axis=1).astype(np.int32)
