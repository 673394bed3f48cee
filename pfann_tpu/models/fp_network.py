"""Fingerprint network (contrastive audio-fingerprint encoder), TPU-native.

Parity target: reference model.py:14-153 —
  * ``SeparableConv2d`` (model.py:14-73): 1x3 conv striding time, then 3x1
    conv striding frequency (depthwise unless ``fuller``), each followed by
    LayerNorm over the full (C, F, T) feature volume and ReLU/ELU.  The
    reference emulates Keras "SAME" padding with explicit asymmetric
    ZeroPad2d (model.py:17-25) — here we pass the asymmetric padding
    directly to the convolution, so the ``hack()`` weight-flip trick
    (model.py:38-52) is unnecessary by construction.
  * ``MyF`` (model.py:75-106): 8 blocks, channels [1, d, d, 2d, 2d, 4d,
    4d, h, h], stride (2, 2) each, (F=256, T=32) -> (1, 1).
  * ``MyG`` (model.py:108-130): grouped split-FC projector h -> (d groups
    x u) -> d, ELU between, then L2 normalization.

TPU-first design notes:
  * Layout is NHWC ([B, F, T, C]) — the native TPU conv layout; channels
    ride the 128-wide lane dimension.
  * ``fuller=True`` (the flagship config, configs/default.json:49) makes
    every conv a dense conv -> all FLOPs land on the MXU.  The depthwise
    variant is supported via ``feature_group_count``.
  * Params are float32; compute dtype is configurable (bfloat16 by
    default for training/inference speed; LayerNorm statistics are always
    computed in float32 for stability).
  * Everything is static-shaped and jit/pjit-friendly; the whole forward
    is one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _same_pad(size: int, k: int, s: int) -> tuple[int, int]:
    """Keras-style SAME padding (asymmetric), cf. model.py:18,24:
    pad_total = ceil(size/s) stride span + k - size."""
    pad = (size - 1) // s * s + k - size
    return (pad // 2, pad - pad // 2)


class _FullLayerNorm(nn.Module):
    """LayerNorm over the entire (F, T, C) feature volume with a full
    elementwise affine, matching torch LayerNorm((C, F, T)) on [B, C, F, T]
    (model.py:21,30).  Statistics in float32."""

    feature_shape: tuple[int, int, int]  # (F, T, C)
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, self.feature_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, self.feature_shape, jnp.float32)
        return (y * scale + bias).astype(orig_dtype)


def _activation(name: str):
    if name == "ReLU":
        return nn.relu
    if name == "ELU":
        return nn.elu
    raise KeyError(name)


class SeparableConv(nn.Module):
    """One encoder block: 1xk conv striding T, then kx1 conv striding F
    (model.py:14-73).  Input/output layout [B, F, T, C]."""

    out_ch: int
    k: int
    stride_t: int
    stride_f: int
    in_F: int
    in_T: int
    fuller: bool = False
    activation: str = "ReLU"
    relu_after_bn: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.activation)
        out_T = (self.in_T - 1) // self.stride_t + 1
        out_F = (self.in_F - 1) // self.stride_f + 1

        # conv over time: kernel (1, k), stride (1, s_t), SAME-pad T only
        x = nn.Conv(
            self.out_ch,
            kernel_size=(1, self.k),
            strides=(1, self.stride_t),
            padding=[(0, 0), _same_pad(self.in_T, self.k, self.stride_t)],
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        ln1 = _FullLayerNorm((self.in_F, out_T, self.out_ch), name="ln1")
        x = act(ln1(x)) if self.relu_after_bn else ln1(act(x))

        # conv over frequency: kernel (k, 1), stride (s_f, 1), SAME-pad F;
        # depthwise unless fuller (model.py:26-29)
        x = nn.Conv(
            self.out_ch,
            kernel_size=(self.k, 1),
            strides=(self.stride_f, 1),
            padding=[_same_pad(self.in_F, self.k, self.stride_f), (0, 0)],
            feature_group_count=1 if self.fuller else self.out_ch,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(x)
        ln2 = _FullLayerNorm((out_F, out_T, self.out_ch), name="ln2")
        x = act(ln2(x)) if self.relu_after_bn else ln2(act(x))
        return x


class Encoder(nn.Module):
    """The 8-block conv stack ``MyF`` (model.py:75-106): [B, F, T] ->
    [B, h] with (F, T) reduced to (1, 1)."""

    d: int
    h: int
    in_F: int
    in_T: int
    fuller: bool = False
    activation: str = "ReLU"
    strides: Sequence | None = None
    relu_after_bn: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h = self.d, self.h
        channels = [1, d, d, 2 * d, 2 * d, 4 * d, 4 * d, h, h]
        x = x[..., None]  # [B, F, T, 1]
        in_F, in_T = self.in_F, self.in_T
        for i in range(8):
            if self.strides is not None:
                # config format: strides[i] = [[1, s_t], [s_f, 1]]
                # (model.py:85: s = strides[i][0][1], strides[i][1][0])
                s_t, s_f = self.strides[i][0][1], self.strides[i][1][0]
            else:
                s_t, s_f = 2, 2
            x = SeparableConv(
                out_ch=channels[i + 1],
                k=3,
                stride_t=s_t,
                stride_f=s_f,
                in_F=in_F,
                in_T=in_T,
                fuller=self.fuller,
                activation=self.activation,
                relu_after_bn=self.relu_after_bn,
                compute_dtype=self.compute_dtype,
                name=f"block{i}",
            )(x)
            in_F = (in_F - 1) // s_f + 1
            in_T = (in_T - 1) // s_t + 1
        assert in_F == in_T == 1, "output must be 1x1"  # model.py:94
        return x.reshape((x.shape[0], self.h))


class Projector(nn.Module):
    """Grouped split-FC projector ``MyG`` (model.py:108-130):
    h -> d groups of (v -> u -> 1), ELU between, optional L2 norm."""

    d: int
    h: int
    u: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, norm: bool = True) -> jnp.ndarray:
        d, h, u = self.d, self.h, self.u
        assert h % d == 0, "h must be divisible by d"  # model.py:112
        v = h // d
        x = x.reshape((-1, d, v)).astype(self.compute_dtype)
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(batch_axis=(0,)), (d, v, u), jnp.float32
        )
        b1 = self.param("b1", nn.initializers.zeros, (d, u), jnp.float32)
        x = jnp.einsum("bdv,dvu->bdu", x, w1.astype(self.compute_dtype)) + b1.astype(
            self.compute_dtype
        )
        x = nn.elu(x)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(batch_axis=(0,)), (d, u, 1), jnp.float32
        )
        b2 = self.param("b2", nn.initializers.zeros, (d, 1), jnp.float32)
        x = jnp.einsum("bdu,duo->bdo", x, w2.astype(self.compute_dtype)) + b2.astype(
            self.compute_dtype
        )
        x = x.reshape((-1, d)).astype(jnp.float32)
        if norm:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x


class FpNetwork(nn.Module):
    """Full fingerprinter (model.py:132-153): log-mel [B, F, T] ->
    L2-normalized embedding [B, d] (float32)."""

    d: int
    h: int
    u: int
    F: int
    T: int
    fuller: bool = False
    activation: str = "ReLU"
    strides: Sequence | None = None
    relu_after_bn: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, norm: bool = True) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        x = Encoder(
            d=self.d,
            h=self.h,
            in_F=self.F,
            in_T=self.T,
            fuller=self.fuller,
            activation=self.activation,
            strides=self.strides,
            relu_after_bn=self.relu_after_bn,
            compute_dtype=self.compute_dtype,
            name="f",
        )(x)
        return Projector(
            d=self.d, h=self.h, u=self.u, compute_dtype=self.compute_dtype, name="g"
        )(x, norm=norm)


def build_fp_network(params: dict[str, Any], compute_dtype=jnp.float32) -> FpNetwork:
    """Build from a pfann-style config dict (cf. train.py:194-202:
    F = n_mels, T = ceil(segment_size * sample_rate / stft_hop))."""
    model_params = params["model"]
    segn = int(params["segment_size"] * params["sample_rate"])
    T = (segn + params["stft_hop"] - 1) // params["stft_hop"]
    return FpNetwork(
        d=model_params["d"],
        h=model_params["h"],
        u=model_params["u"],
        F=params["n_mels"],
        T=T,
        fuller=model_params.get("fuller", False),
        activation=model_params.get("conv_activation", "ReLU"),
        strides=model_params.get("strides"),
        relu_after_bn=model_params.get("relu_after_bn", True),
        compute_dtype=compute_dtype,
    )


def param_count(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
