"""Training loop integration tests on tiny mock data (CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pfann_tpu.data.mock import MockedDataLoader
from pfann_tpu.data.shuffler import TwoStageShuffler, batched
from pfann_tpu.train.trainer import Trainer
from pfann_tpu.utils import checkpoint as ckpt

TINY = {
    "model_dir": None,  # filled per-test
    "batch_size": 16,
    "shuffle_size": None,
    "sample_rate": 8000,
    "stft_n": 1024,
    "stft_hop": 256,
    "n_mels": 256,
    "f_min": 300,
    "f_max": 4000,
    "segment_size": 1,
    "hop_size": 0.5,
    "epoch": 2,
    "lr": 1e-3,
    "tau": 0.05,
    "cutout_min": 0.1,
    "cutout_max": 0.5,
    "mock_sizes": [48, 16],
    "model": {"d": 16, "h": 64, "u": 8, "fuller": True},
}


def make_loaders(cfg):
    train = MockedDataLoader("train", cfg)
    val = MockedDataLoader("validate", cfg)
    val.shuffle = False
    val.eval_time_shift = True
    return train, val


def test_fit_and_resume(tmp_path):
    cfg = dict(TINY, model_dir=str(tmp_path / "m"))
    train, val = make_loaders(cfg)
    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    params = trainer.fit(train, val)
    assert params is not None
    md = cfg["model_dir"]
    assert os.path.exists(os.path.join(md, "model.msgpack"))
    assert ckpt.last_epoch(md) == 1
    assert os.path.exists(os.path.join(md, "checkpoint1.ckpt"))
    assert os.path.exists(os.path.join(md, "metrics.jsonl"))

    # finished model refuses to resume (train.py:226-228 contract)
    trainer2 = Trainer(cfg, compute_dtype=jnp.float32)
    assert trainer2.fit(train, val) is None

    # extend epochs -> resumes from checkpoint 1
    cfg3 = dict(cfg, epoch=3)
    trainer3 = Trainer(cfg3, compute_dtype=jnp.float32)
    params3 = trainer3.fit(train, val)
    assert params3 is not None
    assert ckpt.last_epoch(md) == 2


def test_loss_decreases(tmp_path):
    cfg = dict(TINY, model_dir=str(tmp_path / "m"), epoch=1, mock_sizes=[64, 16])
    train, _ = make_loaders(cfg)
    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    params, opt_state = trainer.init_state()
    # 6 epochs over the same tiny set: loss must drop
    first = last = None
    for epoch in range(6):
        params, opt_state, loss = trainer.train_epoch(params, opt_state, train, epoch)
        if first is None:
            first = loss
        last = loss
    assert last < first


def test_validation_metrics_sane(tmp_path):
    cfg = dict(TINY, model_dir=str(tmp_path / "m"))
    train, val = make_loaders(cfg)
    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    params, _ = trainer.init_state()
    m = trainer.validate(params, train, val)
    assert set(m) == {"accuracy", "top10", "top20", "top100"}
    assert 0 <= m["accuracy"] <= m["top10"] <= m["top20"] <= m["top100"] <= 1


def test_shuffler_determinism():
    s = TwoStageShuffler(20, None)
    s.set_epoch(3)
    a = list(s)
    s.set_epoch(3)
    b = list(s)
    s.set_epoch(4)
    c = list(s)
    assert a == b != c
    assert sorted(a) == list(range(20))


def test_two_stage_shuffler_covers_all():
    ranges = [(0, 5), (5, 12), (12, 20), (20, 21)]
    s = TwoStageShuffler(21, shuffle_size=2, song_ranges=ranges)
    s.set_epoch(0)
    out = list(s)
    assert sorted(out) == list(range(21))
    # chunked: first chunk contains only segments from 2 songs
    first_chunk_songs = set()
    for idx in out[:7]:
        for song, (a, b) in enumerate(ranges):
            if a <= idx < b:
                first_chunk_songs.add(song)
    assert len(first_chunk_songs) <= 2


def test_batched_keeps_partial():
    assert list(batched(iter(range(7)), 3)) == [[0, 1, 2], [3, 4, 5], [6]]


@pytest.mark.slow
def test_train_cli_dp_mock(tmp_path):
    """train.py --mock --dp: the CLI wires the data-parallel mesh over
    all local devices (8 virtual CPU devices here) end to end."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = dict(TINY, model_dir=str(tmp_path / "m"), epoch=1)
    cfg_path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))
    env = dict(
        os.environ,
        PFANN_PLATFORM="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"), "-p", cfg_path,
         "--mock", "--dp", "-w", "0"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "data-parallel over 8 devices" in r.stdout
    assert os.path.exists(os.path.join(cfg["model_dir"], "model.msgpack"))
