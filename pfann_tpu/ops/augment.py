"""On-device waveform augmentation: noise mixing + impulse-response
convolution.

Parity targets:
  * datautil/noise.py:96-109 — SNR-uniform noise mixing:
    x + noise * (vol_x / vol_noise) * 10^(-snr/20), vols are RMS clamped
    at 1e-12, snr ~ U[snr_min, snr_max].
  * datautil/dataset_v2.py:151-163 — augmentation chain: add noise ->
    rfft(fftconv_n) -> multiply random AIR spectrum -> multiply random
    microphone-IR spectrum -> irfft -> crop reverb headroom.
  * datautil/noise.py:83-93 — noise crops are uniform random windows of
    the whole concatenated noise bank (crossing file boundaries, as the
    reference does).

TPU-first: the reference runs this chain in DataLoader worker processes
on CPU (the training hot loop, SURVEY.md 3.1); here it is one jitted
device program — random crops are a vmapped dynamic_slice into an
HBM-resident noise bank, and the FFT convolution batches over the whole
training batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


import numpy as np


def bass_shelf_power_response(
    length: int, sample_rate: int, gain_db: float, f_c: float, q: float = 0.707
) -> np.ndarray:
    """|H(f)|^2 of an audio-EQ-cookbook bass-shelf biquad, sampled at the
    rfft bins of a ``length``-sample signal.

    Used for the ``snr_only_in_f_range`` option (reference
    dataset.py:209-226: SNR volumes measured after
    torchaudio.functional.bass_biquad(sr, -24, f_min) — "our model cannot
    hear <300 Hz sound").  Applying |H|^2 as a spectral weight in the RMS
    computation is the Parseval-equivalent of time-domain filtering.
    """
    a = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * np.pi * f_c / sample_rate
    alpha = np.sin(w0) / (2.0 * q)
    cs = np.cos(w0)
    sq = 2.0 * np.sqrt(a) * alpha
    b = np.array([
        a * ((a + 1) - (a - 1) * cs + sq),
        2 * a * ((a - 1) - (a + 1) * cs),
        a * ((a + 1) - (a - 1) * cs - sq),
    ])
    den = np.array([
        (a + 1) + (a - 1) * cs + sq,
        -2 * ((a - 1) + (a + 1) * cs),
        (a + 1) + (a - 1) * cs - sq,
    ])
    w = np.linspace(0, np.pi, length // 2 + 1)
    z1 = np.exp(-1j * w)
    num = b[0] + b[1] * z1 + b[2] * z1**2
    dnm = den[0] + den[1] * z1 + den[2] * z1**2
    return (np.abs(num / dnm) ** 2).astype(np.float32)


def _weighted_rms(x: jnp.ndarray, band_power: jnp.ndarray | None) -> jnp.ndarray:
    """RMS per row, optionally band-weighted in the frequency domain."""
    eps = 1e-12
    if band_power is None:
        return jnp.sqrt(jnp.clip(jnp.mean(x * x, axis=1), min=eps))
    L = x.shape[1]
    spec = jnp.abs(jnp.fft.rfft(x, axis=1)) ** 2 * band_power[None, :]
    # Parseval: sum(x^2) = (|X_0|^2 + 2 sum_mid + |X_nyq|^2) / L
    mid = 2.0 * jnp.sum(spec[:, 1:-1], axis=1) if L > 2 else 0.0
    total = spec[:, 0] + mid + (spec[:, -1] if L % 2 == 0 else 2.0 * spec[:, -1])
    return jnp.sqrt(jnp.clip(total / (L * L), min=eps))


def add_noises(
    key: jax.Array,
    x: jnp.ndarray,
    noise_bank: jnp.ndarray,
    snr_min: float,
    snr_max: float,
    band_power: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x [B, L]; noise_bank [N] mono float; returns x + scaled noise.
    band_power: optional |H(f)|^2 weight for the SNR volume measurement
    (snr_only_in_f_range)."""
    B, L = x.shape
    kidx, ksnr = jax.random.split(key)
    starts = jax.random.randint(kidx, (B,), 0, noise_bank.shape[0] - L)
    noise = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(noise_bank, s, L)
    )(starts)
    vol_x = _weighted_rms(x, band_power)
    vol_n = _weighted_rms(noise, band_power)
    snr = jax.random.uniform(ksnr, (B,), minval=snr_min, maxval=snr_max)
    ratio = vol_x / vol_n * 10.0 ** (-snr / 20.0)
    return x + ratio[:, None] * noise


def complex_bank(spectra: np.ndarray) -> np.ndarray:
    """np.complex64 [n, f] -> float32 [n, 2, f] (real, imag).

    Complex arrays cannot cross the host<->device boundary on some TPU
    runtimes (the sandbox's axon PJRT returns UNIMPLEMENTED), so IR banks
    travel as real pairs and are recombined on device."""
    return np.stack([spectra.real, spectra.imag], axis=1).astype(np.float32)


def _as_complex(bank_ri: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(bank_ri[:, 0], bank_ri[:, 1])


def ir_convolve(
    key: jax.Array,
    x: jnp.ndarray,
    air_spectra: jnp.ndarray | None,
    mic_spectra: jnp.ndarray | None,
    fftconv_n: int,
) -> jnp.ndarray:
    """Frequency-domain convolution with random room + mic IRs
    (dataset_v2.py:157-162).  x [B, L]; spectra [n, fftconv_n//2+1]
    complex64 or [n, 2, fftconv_n//2+1] float32 real/imag pairs.
    Returns [B, fftconv_n] (caller crops)."""
    kair, kmic = jax.random.split(key)
    spec = jnp.fft.rfft(x, fftconv_n)
    for k, bank in ((kair, air_spectra), (kmic, mic_spectra)):
        if bank is None:
            continue
        if bank.ndim == 3:  # real/imag pair layout
            bank = _as_complex(bank)
        idx = jax.random.randint(k, (x.shape[0],), 0, bank.shape[0])
        spec = spec * bank[idx]
    return jnp.fft.irfft(spec, fftconv_n)


def make_augment_fn(
    mel,
    noise_bank: jnp.ndarray | None,
    air_spectra: jnp.ndarray | None,
    mic_spectra: jnp.ndarray | None,
    *,
    fftconv_n: int,
    pad_start: int,
    segment_size: int,
    snr_min: float,
    snr_max: float,
    band_power: jnp.ndarray | None = None,
):
    """Returns fn(key, x_org [B, seg], x_aug [B, pad+seg],
    augmented: bool) -> mel specs [B, 2 or 1, F, T].

    Mirrors MusicSegmentDataset.__getitem__'s augment+mel tail
    (dataset_v2.py:151-170) as one fused device program.  The corpora
    banks are passed as jit ARGUMENTS (not closures): closure-captured
    device arrays get embedded as program constants, which both bloats the
    executable and requires a device->host fetch at trace time."""

    @functools.partial(jax.jit, static_argnames=("augmented",))
    def _augment(key, x_org, x_aug, noise_b, air_s, mic_s, band_p,
                 augmented=True):
        if x_org.dtype == jnp.int16:  # raw cache samples; scale on device
            x_org = x_org.astype(jnp.float32) * (1.0 / 32768.0)
            x_aug = x_aug.astype(jnp.float32) * (1.0 / 32768.0)
        if augmented:
            if noise_b is not None:
                key, k1 = jax.random.split(key)
                x_aug = add_noises(
                    k1, x_aug, noise_b, snr_min, snr_max, band_power=band_p
                )
            if air_s is not None or mic_s is not None:
                key, k2 = jax.random.split(key)
                x_aug = ir_convolve(k2, x_aug, air_s, mic_s, fftconv_n)
            x_aug = x_aug[..., pad_start : pad_start + segment_size]
            x = jnp.stack([x_org, x_aug], axis=1)  # [B, 2, seg]
        else:
            x = x_org[:, None, :]
        return mel(x)

    def augment_fn(key, x_org, x_aug, augmented=True):
        return _augment(
            key, x_org, x_aug, noise_bank, air_spectra, mic_spectra,
            band_power, augmented=augmented,
        )

    return augment_fn
