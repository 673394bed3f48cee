"""Log-mel spectrogram front-end, TPU-native.

Parity target: reference datautil/melspec.py:4-63 (torchaudio
MelSpectrogram with power=2, hann window, center=True, reflect padding,
htk mel scale, no filterbank norm; ``naf_mode`` switches to power=1,
constant padding, slaney scale + slaney norm).  Config keys and defaults
match configs/default.json:11-16.

TPU-first design: the STFT is computed as two real matmuls against a
window-folded DFT basis (frames @ (win * cos), frames @ (win * sin)) —
this puts the FLOPs on the MXU and avoids jnp.fft, which lowers poorly on
TPU for these sizes.  The mel projection is a third matmul.  Everything is
jittable with static shapes, so XLA fuses framing + matmuls + log +
normalization into a handful of kernels.  An ``impl='fft'`` path is kept
for cross-checking.

Pipeline (melspec.py:33-50):
    volume-normalize (L2 or inf-norm) -> STFT power/magnitude -> mel
    -> +1e-8 (naf: +0.06) -> log or log10 -> optional max-norm.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    mel_scale: str = "htk",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, [n_freqs, n_mels], float32.

    Matches torchaudio.functional.melscale_fbanks semantics (the reference
    relies on torchaudio defaults: htk scale, norm=None; naf mode uses
    slaney/slaney — melspec.py:29-30).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    # triangular filters
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def _hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default periodic=True)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


class MelSpec:
    """Jittable log-mel front-end.

    __call__(x: [..., n_samples] float) -> [..., n_mels, T] where
    T = 1 + n_samples // stft_hop (center=True framing).
    """

    def __init__(
        self,
        sample_rate: int = 8000,
        stft_n: int = 1024,
        stft_hop: int = 256,
        f_min: float = 300,
        f_max: float = 4000,
        n_mels: int = 256,
        naf_mode: bool = False,
        mel_log: str = "log",
        spec_norm: str = "l2",
        impl: str = "dft",
    ):
        self.sample_rate = sample_rate
        self.stft_n = stft_n
        self.stft_hop = stft_hop
        self.n_mels = n_mels
        self.naf_mode = naf_mode
        self.mel_log = mel_log
        self.spec_norm = spec_norm
        self.impl = impl
        self.pad_mode = "constant" if naf_mode else "reflect"
        self.power = 1 if naf_mode else 2

        n_freqs = stft_n // 2 + 1
        fb = mel_filterbank(
            n_freqs,
            f_min,
            f_max,
            n_mels,
            sample_rate,
            mel_scale="slaney" if naf_mode else "htk",
            norm="slaney" if naf_mode else None,
        )
        self.fbank = jnp.asarray(fb)  # [n_freqs, n_mels]

        win = _hann_window(stft_n)
        if impl == "dft":
            # Window-folded real DFT basis: frames @ Wc -> Re, frames @ Ws -> Im.
            # Two [stft_n, n_freqs] matrices (~4 MB for n=1024) living in HBM;
            # the per-batch work is MXU matmuls.
            n = np.arange(stft_n)[:, None]
            k = np.arange(n_freqs)[None, :]
            ang = 2.0 * np.pi * n * k / stft_n
            self.wcos = jnp.asarray(win[:, None] * np.cos(ang).astype(np.float32))
            self.wsin = jnp.asarray(win[:, None] * -np.sin(ang).astype(np.float32))
        self.window = jnp.asarray(win)

    def _frames(self, x: jnp.ndarray) -> jnp.ndarray:
        """Center-padded overlapping frames: [..., T, stft_n]."""
        pad = self.stft_n // 2
        mode = "reflect" if self.pad_mode == "reflect" else "constant"
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=mode)
        n_samples = x.shape[-1]
        n_frames = 1 + (n_samples - self.stft_n) // self.stft_hop
        idx = (
            np.arange(n_frames)[:, None] * self.stft_hop
            + np.arange(self.stft_n)[None, :]
        )
        return x[..., idx]

    def _spectrogram(self, x: jnp.ndarray) -> jnp.ndarray:
        """Power (or magnitude) spectrogram, [..., T, n_freqs], float32."""
        frames = self._frames(x)
        if self.impl == "dft":
            re = jnp.matmul(frames, self.wcos, preferred_element_type=jnp.float32)
            im = jnp.matmul(frames, self.wsin, preferred_element_type=jnp.float32)
            power = re * re + im * im
        else:
            spec = jnp.fft.rfft(frames * self.window, self.stft_n)
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        if self.power == 1:
            power = jnp.sqrt(jnp.maximum(power, 0.0))
        return power

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        # volume normalization (melspec.py:34-36): inf-norm for 'max', else L2
        if self.spec_norm == "max":
            denom = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        else:
            denom = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.maximum(denom, 1e-12)

        mel = jnp.matmul(
            self._spectrogram(x), self.fbank, preferred_element_type=jnp.float32
        )  # [..., T, n_mels]
        mel = jnp.swapaxes(mel, -1, -2)  # [..., n_mels, T]

        mel = mel + (0.06 if self.naf_mode else 1e-8)
        if self.mel_log == "log10":
            mel = jnp.log10(mel)
        elif self.mel_log == "log":
            mel = jnp.log(mel)
        if self.spec_norm == "max":
            mel = mel - jnp.max(mel, axis=(-2, -1), keepdims=True)
        return mel


def build_mel_spec_layer(params: dict[str, Any], impl: str = "dft") -> MelSpec:
    """Build from a pfann-style config dict (melspec.py:52-63)."""
    return MelSpec(
        sample_rate=params["sample_rate"],
        stft_n=params["stft_n"],
        stft_hop=params["stft_hop"],
        f_min=params["f_min"],
        f_max=params["f_max"],
        n_mels=params["n_mels"],
        naf_mode=params.get("naf_mode", False),
        mel_log=params.get("mel_log", "log"),
        spec_norm=params.get("spec_norm", "l2"),
        impl=impl,
    )
