"""Waveform -> fingerprint embedding pipeline for builder/matcher.

Fuses the mel front-end and the encoder into one jitted program (the
reference runs torchaudio mel then the torch model per 16/32-row chunk,
builder.py:88-100 / matcher.py:110-128).  Chunks are padded to a fixed
size so every call reuses one compiled executable.
"""

from __future__ import annotations

import functools
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
        self.variables = ckpt.load_model(model_path, target)
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
