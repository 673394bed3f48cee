"""Device (accelerator-batched) landmark extraction vs the numpy
reference path (pfann_tpu/landmark/device.py vs core.py).

The contract: DevicePeakExtractor.extract returns exactly
find_peaks(spectrogram(wav)) — same peaks, same time-sorted order — so
the downstream pairing/votes are unchanged.  On the CPU backend XLA's
rfft and numpy's agree bitwise, so parity is asserted EXACT here; on the
real TPU the FFT differs in ulps and agreement is measured (not
asserted) by bench.py --lm.
"""

import numpy as np
import pytest

from pfann_tpu.landmark import core
from pfann_tpu.landmark.device import DevicePeakExtractor, as_device_input


def make_tone(freq: float, seconds: float, sr: int) -> np.ndarray:
    t = np.arange(int(sr * seconds), dtype=np.float32) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _song(seed: int, seconds: float) -> np.ndarray:
    """A peaky test signal: decaying tone bursts over a noise floor
    (plain noise has no constellation — the median gate eats it)."""
    rng = np.random.default_rng(seed)
    sr = 8000
    n = int(sr * seconds)
    out = 0.01 * rng.standard_normal(n).astype(np.float32)
    t = 0
    while t < n:
        dur = min(int(sr * rng.uniform(0.1, 0.4)), n - t)
        tone = make_tone(float(rng.uniform(100, 3500)), dur / sr, sr)
        out[t : t + dur] += (rng.uniform(0.3, 0.8) * tone
                             * np.exp(-np.arange(dur) / (0.05 * sr))
                             ).astype(np.float32)
        t += dur + int(sr * rng.uniform(0.05, 0.2))
    return 0.6 * out / max(float(np.abs(out).max()), 1e-9)


def test_device_peaks_exact_parity():
    # lengths cover: frame-bucket padding, a non-hop-multiple tail,
    # sub-n_fft zero-pad, and pure silence (gate kills everything)
    wavs = [_song(0, 3.0), _song(1, 1.3), _song(2, 5.01),
            _song(3, 0.05), np.zeros(400, np.float32)]
    ex = DevicePeakExtractor(batch=3)
    dev = ex.extract(wavs)
    for i, w in enumerate(wavs):
        ref = core.find_peaks(core.spectrogram(w))
        assert dev[i].shape == ref.shape, "song %d" % i
        assert np.array_equal(dev[i], ref), "song %d" % i


def test_int16_input_matches_float():
    w = _song(4, 2.0)
    q = (np.clip(w, -1, 1) * 32767).astype(np.int16)  # a "decoded WAV"
    f = q.astype(np.float32) / 32768
    ex = DevicePeakExtractor(batch=2)
    di = as_device_input(f)
    assert di.dtype == np.int16  # exact int16 representation detected
    a, b = ex.extract([di, f])
    assert np.array_equal(a, b)
    # resampled-style floats stay f32
    assert as_device_input(f * 0.7071067).dtype == np.float32


def test_mixed_dtype_chunk_rescales_int16():
    """An int16 wav sharing a chunk with a float32 wav must be rescaled
    on host (regression: it was cast raw, shifting the spectrogram by
    log(32768) — the shift cancels through the median gate EXCEPT near
    the log epsilon floor, so quiet signals changed peaks)."""
    w = 1e-3 / 0.6 * _song(4, 2.0)  # quiet: int16 range ~ +-32
    q = (np.clip(w, -1, 1) * 32767).astype(np.int16)
    f = q.astype(np.float32) / 32768
    ref = core.find_peaks(core.spectrogram(f))
    ex = DevicePeakExtractor(batch=2)
    mixed, _ = ex.extract([q, _song(5, 2.0)])  # int16 + float32 chunk
    assert np.array_equal(mixed, ref)


def test_build_with_extractor_matches_host(tmp_path):
    wavs = [_song(5, 2.0), _song(6, 2.0), _song(7, 2.0)]
    host = core.LandmarkIndex.build(iter(wavs), song_list=["a", "b", "c"])
    dev = core.LandmarkIndex.build(
        iter(wavs), song_list=["a", "b", "c"],
        extractor=DevicePeakExtractor(batch=2),
    )
    assert np.array_equal(host.hashes, dev.hashes)
    assert np.array_equal(host.songs, dev.songs)
    assert np.array_equal(host.anchors, dev.anchors)
    # and the index still answers through query_hashes
    q = wavs[1][: 8000]
    best_h, tab_h = host.query(q)
    best_d, tab_d = dev.query_hashes(*core.extract_hashes(q))
    assert best_h == best_d == 1
    assert np.array_equal(tab_h, tab_d)


@pytest.mark.slow
def test_long_signal_buckets():
    # > one frame bucket (64 frames = 2.05 s): 3 buckets in one batch
    wavs = [_song(8, 7.9), _song(9, 2.2), _song(10, 4.4)]
    ex = DevicePeakExtractor(batch=3)
    dev = ex.extract(wavs)
    for i, w in enumerate(wavs):
        assert np.array_equal(dev[i], core.find_peaks(core.spectrogram(w)))


def test_bucket_boundary_with_remainder_samples():
    # ADVICE r4 high: frame count an EXACT multiple of the 64-frame
    # bucket (Tb == nf) plus remainder samples past the last complete
    # frame made the signal longer than the bucketed buffer and the
    # fill raised ValueError.  nf = 64 needs len in [17152, 17407];
    # 17252 is the reported repro (100 remainder samples).
    n = 1024 + 63 * 256 + 100  # == 17252, nf == 64 == bucket
    w = _song(11, (n + 1) / 8000.0)[:n]
    assert 1 + (w.shape[0] - 1024) // 256 == 64
    ex = DevicePeakExtractor(batch=2)
    for wav in (w, (np.clip(w, -1, 1) * 32767).astype(np.int16)):
        dev = ex.extract([wav])
        f32 = wav.astype(np.float32) / 32768 if wav.dtype == np.int16 else wav
        ref = core.find_peaks(core.spectrogram(f32))
        assert np.array_equal(dev[0], ref)
