"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths are tested the standard JAX way (SURVEY.md section 4):
force the host platform and fake 8 devices.  The sandbox's axon site hook
overrides the JAX_PLATFORMS env var, so we force the platform through
jax.config (which wins) after setting XLA_FLAGS (which must precede
backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of FIXED shapes (mesh train steps, dryrun, model variants) —
# identical run to run, so cache them on disk.  Set via env so the e2e
# tests' CLI subprocesses inherit it too (each pays its own compiles
# otherwise).  Measured: 665 s cold -> ~half warm (VERDICT r2 next #3).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# The env vars above are IGNORED in subprocesses too (the axon hook's
# early jax import reads config before they can win) — PFANN_COMPILE_CACHE
# goes through apply_platform_override()'s explicit jax.config.update,
# which the e2e CLI subprocesses (builder/matcher/extractemb/...) all
# call.  Measured: builder on the tiny e2e fixture 34 s -> ~8 s warm.
os.environ.setdefault(
    "PFANN_COMPILE_CACHE", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the axon sitecustomize imports jax before this file runs, so the env
# vars above only reach SUBPROCESSES; set the in-process config directly
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


# ---------------------------------------------------------------------
# Shared synthetic-corpus fixture (music + noise + micirp + AIR + config)
# used by the datapipe / querygen / denoise / e2e-style tests.

import csv  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def run_cli_inproc(script: str, argv, capture: bool = False) -> str:
    """Execute a repo CLI script in-process (runpy, ``__name__ ==
    "__main__"``) with ``sys.argv`` patched — the same code path as
    ``python script.py args...`` minus the ~3-6 s interpreter + axon-hook
    startup every subprocess pays in this sandbox (CLAUDE.md).  Used for
    the light tool CLIs; the flagship CLIs (builder / matcher / genquery /
    train / landmark) keep true-subprocess tests for real process-boundary
    coverage.  PFANN_PLATFORM / PFANN_COMPILE_CACHE are stripped for the
    duration so an in-process ``apply_platform_override`` can never touch
    the suite's forced-CPU backend config."""
    import contextlib
    import io
    import runpy
    import sys

    old_argv = sys.argv
    saved = {
        k: os.environ.pop(k, None)
        for k in ("PFANN_PLATFORM", "PFANN_COMPILE_CACHE")
    }
    buf = io.StringIO()
    sys.argv = [script] + [str(a) for a in argv]
    try:
        ctx = (
            contextlib.redirect_stdout(buf)
            if capture
            else contextlib.nullcontext()
        )
        with ctx:
            try:
                runpy.run_path(script, run_name="__main__")
            except SystemExit as e:  # argparse --help / explicit exits
                assert not e.code, "CLI exited with %r" % (e.code,)
    finally:
        sys.argv = old_argv
        for k, v in saved.items():
            if v is not None:
                os.environ[k] = v
    return buf.getvalue()


@pytest.fixture()
def run_cli():
    return run_cli_inproc


@pytest.fixture(scope="session")
def pipeline_root(tmp_path_factory):
    """Synthetic corpus + noise + micirp wavs + AIR .mat + config."""
    import scipy.io

    from pfann_tpu.audio.io import write_wav

    root = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(3)
    music_dir = root / "music"
    music_dir.mkdir()
    rows = []
    for i in range(4):
        wav = (rng.random(8000 * 6, dtype=np.float32) - 0.5) * 0.8
        write_wav(str(music_dir / f"m{i}.wav"), wav, 8000)
        rows.append(f"m{i}.wav")
    for split in ("train", "validate"):
        with open(root / f"music_{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["file"])
            w.writerows([[r] for r in rows])

    noise_dir = root / "noise"
    noise_dir.mkdir()
    with open(root / "noise.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"])
        for i in range(2):
            wav = (rng.random(8000 * 3, dtype=np.float32) - 0.5) * 0.5
            write_wav(str(noise_dir / f"n{i}.wav"), wav, 8000)
            w.writerow([f"n{i}.wav"])

    mic_dir = root / "micirp"
    mic_dir.mkdir()
    with open(root / "micirp.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"])
        ir = np.zeros(4000, np.float32)
        ir[0] = 1.0
        ir[800] = 0.3
        write_wav(str(mic_dir / "mic0.wav"), ir, 8000)
        w.writerow(["mic0.wav"])

    air_dir = root / "air"
    air_dir.mkdir()
    with open(root / "air.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"])
        h = np.zeros((1, 2000), np.float64)
        h[0, 0] = 1.0
        h[0, 300] = 0.4
        scipy.io.savemat(
            str(air_dir / "a0.mat"),
            {
                "h_air": h,
                "air_info": {"fs": np.array([[8000]]), "room": "testroom"},
            },
        )
        w.writerow(["a0.mat"])

    cfg = {
        "train_csv": str(root / "music_train.csv"),
        "validate_csv": str(root / "music_validate.csv"),
        "music_dir": str(music_dir),
        "model_dir": str(root / "model"),
        "cache_dir": str(root / "caches"),
        "batch_size": 8,
        "shuffle_size": 2,
        "sample_rate": 8000,
        "stft_n": 1024,
        "stft_hop": 256,
        "n_mels": 256,
        "f_min": 300,
        "f_max": 4000,
        "segment_size": 1,
        "hop_size": 0.5,
        "time_offset": 1.2,
        "pad_start": 0.5,
        "epoch": 1,
        "lr": 1e-3,
        "tau": 0.05,
        "cutout_min": 0.1,
        "cutout_max": 0.5,
        "noise": {
            "train": str(root / "noise.csv"),
            "validate": str(root / "noise.csv"),
            "dir": str(noise_dir),
            "snr_max": 10,
            "snr_min": 0,
        },
        "micirp": {
            "train": str(root / "micirp.csv"),
            "validate": str(root / "micirp.csv"),
            "dir": str(mic_dir),
            "length": 0.5,
        },
        "air": {
            "train": str(root / "air.csv"),
            "validate": str(root / "air.csv"),
            "dir": str(air_dir),
            "length": 0.25,
        },
        "model": {"d": 16, "h": 64, "u": 8, "fuller": True},
        "indexer": {"top_k": 10, "frame_shift_mul": 1},
    }
    return cfg
