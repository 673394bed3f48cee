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


def add_noises(
    key: jax.Array,
    x: jnp.ndarray,
    noise_bank: jnp.ndarray,
    snr_min: float,
    snr_max: float,
) -> jnp.ndarray:
    """x [B, L]; noise_bank [N] mono float; returns x + scaled noise."""
    B, L = x.shape
    kidx, ksnr = jax.random.split(key)
    starts = jax.random.randint(kidx, (B,), 0, noise_bank.shape[0] - L)
    noise = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(noise_bank, s, L)
    )(starts)
    eps = 1e-12
    vol_x = jnp.sqrt(jnp.clip(jnp.mean(x * x, axis=1), min=eps))
    vol_n = jnp.sqrt(jnp.clip(jnp.mean(noise * noise, axis=1), min=eps))
    snr = jax.random.uniform(ksnr, (B,), minval=snr_min, maxval=snr_max)
    ratio = vol_x / vol_n * 10.0 ** (-snr / 20.0)
    return x + ratio[:, None] * noise


def ir_convolve(
    key: jax.Array,
    x: jnp.ndarray,
    air_spectra: jnp.ndarray | None,
    mic_spectra: jnp.ndarray | None,
    fftconv_n: int,
) -> jnp.ndarray:
    """Frequency-domain convolution with random room + mic IRs
    (dataset_v2.py:157-162).  x [B, L]; spectra [n, fftconv_n//2+1]
    complex64.  Returns [B, fftconv_n] (caller crops)."""
    kair, kmic = jax.random.split(key)
    spec = jnp.fft.rfft(x, fftconv_n)
    if air_spectra is not None:
        idx = jax.random.randint(kair, (x.shape[0],), 0, air_spectra.shape[0])
        spec = spec * air_spectra[idx]
    if mic_spectra is not None:
        idx = jax.random.randint(kmic, (x.shape[0],), 0, mic_spectra.shape[0])
        spec = spec * mic_spectra[idx]
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
):
    """Returns jitted fn(key, x_org [B, seg], x_aug [B, pad+seg],
    augmented: bool static) -> mel specs [B, 2 or 1, F, T].

    Mirrors MusicSegmentDataset.__getitem__'s augment+mel tail
    (dataset_v2.py:151-170) as one fused device program."""

    @functools.partial(jax.jit, static_argnames=("augmented",))
    def augment_fn(key, x_org, x_aug, augmented=True):
        if augmented:
            if noise_bank is not None:
                key, k1 = jax.random.split(key)
                x_aug = add_noises(k1, x_aug, noise_bank, snr_min, snr_max)
            if air_spectra is not None or mic_spectra is not None:
                key, k2 = jax.random.split(key)
                x_aug = ir_convolve(k2, x_aug, air_spectra, mic_spectra, fftconv_n)
            x_aug = x_aug[..., pad_start : pad_start + segment_size]
            x = jnp.stack([x_org, x_aug], axis=1)  # [B, 2, seg]
        else:
            x = x_org[:, None, :]
        return mel(x)

    return augment_fn
