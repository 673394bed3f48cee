"""Mel front-end golden tests.

The JAX implementation is validated against an independent, dead-simple
numpy DSP reference written here (explicit DFT loop semantics via
np.fft.rfft on hand-built frames), covering reflect/constant padding,
htk/slaney scales, power 1/2, log/log10, and l2/max volume norm — the
exact knobs of reference datautil/melspec.py:4-63.
"""

import numpy as np
import pytest

from pfann_tpu.ops.melspec import MelSpec, mel_filterbank


def numpy_melspec(
    x,
    sr=8000,
    n_fft=1024,
    hop=256,
    f_min=300,
    f_max=4000,
    n_mels=256,
    naf_mode=False,
    mel_log="log",
    spec_norm="l2",
):
    x = np.asarray(x, dtype=np.float64)
    # volume norm
    if spec_norm == "max":
        denom = np.max(np.abs(x), axis=-1, keepdims=True)
    else:
        denom = np.sqrt(np.sum(x * x, axis=-1, keepdims=True))
    x = x / np.maximum(denom, 1e-12)

    pad = n_fft // 2
    mode = "constant" if naf_mode else "reflect"
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=mode)
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack(
        [xp[..., t * hop : t * hop + n_fft] * win for t in range(n_frames)], axis=-2
    )
    spec = np.fft.rfft(frames, n_fft, axis=-1)
    power = np.abs(spec) ** 2
    if naf_mode:
        power = np.sqrt(power)
    fb = mel_filterbank(
        n_fft // 2 + 1,
        f_min,
        f_max,
        n_mels,
        sr,
        mel_scale="slaney" if naf_mode else "htk",
        norm="slaney" if naf_mode else None,
    ).astype(np.float64)
    mel = power @ fb
    mel = np.swapaxes(mel, -1, -2)
    mel = mel + (0.06 if naf_mode else 1e-8)
    mel = np.log10(mel) if mel_log == "log10" else np.log(mel)
    if spec_norm == "max":
        mel = mel - np.max(mel, axis=(-2, -1), keepdims=True)
    return mel


@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_default_mode_matches_numpy(impl):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8000)).astype(np.float32) * 0.3
    ours = np.asarray(MelSpec(impl=impl)(x))
    ref = numpy_melspec(x)
    assert ours.shape == (3, 256, 32)
    # Linear-power parity: f32 STFT has an absolute noise floor ~1e-7
    # (the float64 numpy reference resolves below it; torch f32 does not).
    np.testing.assert_allclose(np.exp(ours), np.exp(ref), atol=1e-6, rtol=2e-3)
    # Log-domain parity on bins above the f32 noise floor.
    mask = ref > -12
    assert mask.mean() > 0.9
    np.testing.assert_allclose(ours[mask], ref[mask], atol=2e-2, rtol=0)


def test_naf_mode_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    m = MelSpec(naf_mode=True, mel_log="log10", spec_norm="max")
    ref = numpy_melspec(x, naf_mode=True, mel_log="log10", spec_norm="max")
    np.testing.assert_allclose(np.asarray(m(x)), ref, atol=5e-3, rtol=0)


def test_frame_count_formula():
    # T = 1 + n // hop with center padding; reference relies on
    # T = ceil(segment * sr / hop) = 32 for the 1 s / 8 kHz default
    x = np.zeros((1, 8000), dtype=np.float32)
    assert MelSpec()(x).shape[-1] == 32


def test_filterbank_properties():
    fb = mel_filterbank(513, 300, 4000, 256, 8000, "htk", None)
    assert fb.shape == (513, 256)
    assert fb.min() >= 0
    # filters only respond inside [f_min, f_max]
    freqs = np.linspace(0, 4000, 513)
    active = fb.sum(axis=1) > 0
    assert not active[freqs < 295].any()


def test_silence_is_finite():
    x = np.zeros((1, 8000), dtype=np.float32)
    out = np.asarray(MelSpec()(x))
    assert np.isfinite(out).all()
