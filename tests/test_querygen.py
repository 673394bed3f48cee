"""Query-synthesis building blocks (pfann_tpu/data/querygen.py) and the
rewritten genquery_naf / denoise CLIs on the shared synthetic corpus."""

import csv
import json
import os

import numpy as np
import pytest

from pfann_tpu.data.querygen import (
    ClipSampler,
    ReverbBank,
    fft_block_len,
    peak_normalize,
    segment_grid,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fft_block_len_covers_window():
    params = {
        "pad_start": 1, "sample_rate": 8000,
        "air": {"length": 1}, "micirp": {"length": 0.5},
    }
    n = fft_block_len(params, 10)
    assert n >= (1 + 10 + 1 + 0.5) * 8000
    assert n & (n - 1) == 0  # power of two


def test_clip_sampler_geometry(tmp_path):
    from pfann_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(8000 * 5).astype(np.float32) * 0.1
    path = str(tmp_path / "song.wav")
    write_wav(path, wav, 8000)

    sampler = ClipSampler(8000, clip_seconds=2, context_seconds=0.5)
    clip, t0 = sampler.sample(np.random.default_rng(1), path)
    assert clip.shape == (int(8000 * 2.5),)
    assert 0 <= t0 <= 3.0
    # the clip body must match the source at the reported offset
    # (16-bit quantization from the wav roundtrip)
    start = int(round(t0 * 8000))
    np.testing.assert_allclose(
        clip[sampler.n_ctx :], wav[start : start + sampler.n_clip], atol=2e-4
    )
    # context: zeros when the crop starts at the file head
    sampler2 = ClipSampler(8000, clip_seconds=5, context_seconds=1)
    clip2, t02 = sampler2.sample(np.random.default_rng(2), path)
    assert t02 == 0.0
    assert np.all(clip2[: sampler2.n_ctx] == 0)


def test_clip_sampler_short_file_pads(tmp_path):
    from pfann_tpu.audio.io import write_wav

    wav = np.ones(4000, np.float32) * 0.5
    path = str(tmp_path / "short.wav")
    write_wav(path, wav, 8000)
    sampler = ClipSampler(8000, clip_seconds=2, context_seconds=0.25)
    clip, t0 = sampler.sample(np.random.default_rng(0), path)
    assert t0 == 0.0
    assert clip.shape == (int(8000 * 2.25),)
    assert np.all(clip[: sampler.n_ctx] == 0)          # context
    assert np.all(clip[sampler.n_ctx + 4000 :] == 0)   # tail pad


def test_reverb_bank_matches_direct_fft_conv():
    rng = np.random.default_rng(3)
    n = 4096
    x = rng.standard_normal(3000).astype(np.float32)

    class FakeAIR:
        data = np.fft.rfft(
            np.stack([np.eye(1, 512, 0)[0], np.eye(1, 512, 7)[0]]), n
        ).astype(np.complex64)
        names = ["roomA", "roomB"]

        def random_choose_name(self, rng):
            i = int(rng.integers(0, 2))
            return self.data[i], self.names[i]

    bank = ReverbBank(FakeAIR(), None, n)
    mult, room = bank.draw(np.random.default_rng(5))
    out = bank.apply(x, mult, (100, 2100))
    ref = np.fft.irfft(np.fft.rfft(x, n) * mult, n)[100:2100]
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert room in ("roomA", "roomB")

    # None multiplier = clean pass-through of the keep window
    empty = ReverbBank(None, None, n)
    mult0, room0 = empty.draw(np.random.default_rng(0))
    assert mult0 is None and room0 == ""
    np.testing.assert_array_equal(empty.apply(x, None, (5, 105)), x[5:105])


def test_segment_grid_shapes_and_demean():
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(8000 * 3 + 123).astype(np.float32)
    rows = segment_grid(np.random.default_rng(7), audio, 8000, 1600)
    assert rows.shape == (3, 8000)
    np.testing.assert_allclose(rows.mean(axis=1), 0, atol=1e-6)
    # deterministic under the same seed
    rows2 = segment_grid(np.random.default_rng(7), audio, 8000, 1600)
    np.testing.assert_array_equal(rows, rows2)


def test_peak_normalize():
    assert peak_normalize(np.zeros(4)).max() == 0
    x = np.array([0.1, -0.5, 0.25])
    np.testing.assert_allclose(np.abs(peak_normalize(x)).max(), 1.0)


def _write_cfg(pipeline_root, tmp_path):
    cfg = dict(pipeline_root, test_csv=pipeline_root["train_csv"])
    cfg_path = str(tmp_path / "gen.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return cfg_path


def test_genquery_naf_cli(pipeline_root, tmp_path, run_cli):
    """NAF-protocol query generation: whole-file queries with
    per-segment shifts; deterministic under the per-query seeds."""
    cfg_path = _write_cfg(pipeline_root, tmp_path)
    out = str(tmp_path / "nafq")
    run_cli(
        os.path.join(REPO, "genquery_naf.py"),
        ["-p", cfg_path, "-l", "1", "--num", "2", "--mode", "test",
         "-o", out, "--yes"],
    )

    from pfann_tpu.audio.io import get_audio

    rows = list(csv.reader(open(os.path.join(out, "expected.csv"))))
    assert rows[0] == ["query", "answer", "time", "snr", "reverb"]
    assert len(rows) == 3
    paths = open(os.path.join(out, "list.txt")).read().splitlines()
    wav, rate = get_audio(paths[0])
    assert rate == 8000
    assert wav.shape[1] == 6 * 8000  # 6 s source -> 6 whole segments
    assert np.abs(wav).max() <= 1.0

    out2 = str(tmp_path / "nafq2")
    run_cli(
        os.path.join(REPO, "genquery_naf.py"),
        ["-p", cfg_path, "-l", "1", "--num", "2", "--mode", "test",
         "-o", out2, "--yes"],
    )
    a, _ = get_audio(paths[0])
    b, _ = get_audio(os.path.join(out2, os.path.basename(paths[0])))
    np.testing.assert_array_equal(a, b)


def test_denoise_createdataset_cli(pipeline_root, tmp_path, run_cli):
    """Triplet generation: mix == music + noise up to the joint norm, and
    all three wavs share the peak."""
    cfg_path = _write_cfg(pipeline_root, tmp_path)
    out = str(tmp_path / "triplets")
    run_cli(
        os.path.join(REPO, "denoise", "createdataset.py"),
        ["-d", pipeline_root["music_dir"],
         "--noise", pipeline_root["noise"]["dir"],
         "--air", pipeline_root["air"]["dir"],
         "--micirp", pipeline_root["micirp"]["dir"],
         "-p", cfg_path, "-l", "2", "-o", out],
    )

    from pfann_tpu.audio.io import get_audio

    for split in ("train", "validate"):
        rows = list(csv.reader(open(
            os.path.join(out, "denoise_%s.csv" % split))))
        assert rows[0] == ["mix_path", "music_path", "noise_path", "duration"]
        assert len(rows) == 5  # 4 songs + header
        # rows follow the header (the reference swaps mix/music here)
        assert rows[1][0].startswith("mix/")
        assert rows[1][1].startswith("music/")
    base = rows[1][0].split("/")[1]
    music, _ = get_audio(os.path.join(out, "music", base))
    noise, _ = get_audio(os.path.join(out, "noise", base))
    mix, _ = get_audio(os.path.join(out, "mix", base))
    assert music.shape[1] == 2 * 8000
    # 16-bit wav quantization: compare loosely
    np.testing.assert_allclose(mix, music + noise, atol=5e-4)
