"""Streaming ingestion (pfann_tpu/audio/stream.py): sample-exact chunked
resample, long-file equality with the whole-file path, bounded memory."""

import math
import os

import numpy as np
import pytest
from scipy.signal import resample_poly

from pfann_tpu.audio.io import write_wav
from pfann_tpu.audio.stream import (
    WaveChunkReader,
    open_stream,
    stream_audio_resampled,
    stream_resample,
)

@pytest.mark.parametrize("src,dst", [(44100, 8000), (22050, 8000),
                                     (16000, 8000), (8000, 44100)])
def test_stream_resample_bitwise_equals_whole_file(src, dst):
    rng = np.random.default_rng(0)
    n = int(src * 7.3) + 17  # several blocks + ragged tail
    x = rng.standard_normal((2, n)).astype(np.float32)

    def chunks():
        step = int(src * 0.9)
        for i in range(0, n, step):
            yield x[:, i : i + step]

    got = np.concatenate(
        list(stream_resample(chunks(), src, dst, block_seconds=2.0)), axis=-1
    )
    g = math.gcd(src, dst)
    want = resample_poly(x, dst // g, src // g, axis=-1).astype(np.float32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_stream_resample_shorter_than_one_block():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4410).astype(np.float32)  # 0.1 s @ 44100
    got = np.concatenate(
        list(stream_resample(iter([x]), 44100, 8000, block_seconds=30.0))
    )
    want = resample_poly(x, 80, 441).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_wave_chunk_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    wav = (rng.random((2, 44100), dtype=np.float32) - 0.5) * 0.9
    path = str(tmp_path / "c.wav")
    write_wav(path, wav, 44100)
    with open_stream(path) as r:
        assert isinstance(r, WaveChunkReader)
        assert (r.rate, r.channels) == (44100, 2)
        parts = list(r.chunks(10000))
    got = np.concatenate(parts, axis=-1)
    assert got.shape == (2, 44100)
    np.testing.assert_allclose(got, wav, atol=1.0 / 32768)


def test_long_file_segments_identical_streaming_vs_whole(tmp_path):
    """Multi-block track (3+ 30 s resample blocks + ragged tail): the
    MusicDataset streaming path must produce the exact same query/DB
    segments as whole-file decode.  (The slow-marked memory test covers
    the full >10 min length; seam correctness only needs several
    block crossings.)"""
    from pfann_tpu.data.musicdata import MusicDataset

    rng = np.random.default_rng(3)
    seconds = 97
    t = np.arange(22050 * seconds, dtype=np.float32)
    wav = (0.3 * np.sin(2 * np.pi * 440 / 22050 * t)
           + 0.05 * rng.standard_normal(t.shape[0]).astype(np.float32))
    path = str(tmp_path / "long.wav")
    write_wav(path, wav, 22050)
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write(path + "\n")

    params = {
        "sample_rate": 8000, "segment_size": 1, "hop_size": 0.5,
        "indexer": {"frame_shift_mul": 1},
    }
    _, _, seg_stream = MusicDataset(lst, dict(params)).load(0)
    _, _, seg_whole = MusicDataset(
        lst, dict(params, streaming=False)
    ).load(0)
    assert seg_stream.shape == seg_whole.shape == (2 * seconds - 1, 8000)
    np.testing.assert_array_equal(seg_stream, seg_whole)


@pytest.mark.slow
def test_streaming_bounds_peak_memory(tmp_path):
    """A 10.5-min 44.1 kHz stereo track: the streaming path's peak
    allocation must sit far below whole-file decode's (the fma_full
    bounded-memory property, reference datautil/audio.py:77-153).
    tracemalloc sees numpy buffers; process RSS would be swamped by the
    sandbox's unconditional jax import."""
    import tracemalloc

    from pfann_tpu.audio.io import get_audio
    from pfann_tpu.audio.resample import resample

    rng = np.random.default_rng(4)
    seconds = 10 * 60 + 30
    wav = (rng.random((2, 44100 * seconds), dtype=np.float32) - 0.5) * 0.5
    path = str(tmp_path / "big.wav")
    write_wav(path, wav, 44100)
    del wav

    tracemalloc.start()
    out_s, _ = stream_audio_resampled(path, 8000)
    peak_stream = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    tracemalloc.start()
    whole, rate = get_audio(path)
    out_w = resample(whole, rate, 8000)
    peak_whole = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    np.testing.assert_array_equal(out_s, out_w)
    # whole-file peaks at ~330 MB (int16 bytes + f32 [2, 27.8M] + output);
    # streaming holds one 30 s source block + the 8 kHz output
    assert peak_stream < peak_whole / 2, (peak_stream, peak_whole)
