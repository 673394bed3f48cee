#!/usr/bin/env python
"""Build a landmark-system database (the `lm*` models of testall.sh).

Replaces the reference's external `../pfa` builder (that repo is not in
the snapshot; see pfann_tpu/landmark/core.py).

    python lm_builder.py <music list> <db dir> [sample_rate]
"""

import os
import sys
import time

from pfann_tpu.audio.io import get_audio
from pfann_tpu.audio.resample import resample
from pfann_tpu.landmark import LandmarkIndex
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_file_list
from pfann_tpu.utils.platform import apply_platform_override


def load_mono(path: str, sr: int):
    wav, rate = get_audio(path)
    wav = wav.mean(axis=0)
    if rate != sr:
        wav = resample(wav, rate, sr)
    return wav


def make_extractor(logger=None):
    """The batched accelerator peak extractor, or None for the numpy
    path.  PFANN_LM_DEVICE=1/0 forces it; default is on exactly when a
    real accelerator backend is up (XLA-on-CPU spectrograms would only
    add compile time over numpy on this host)."""
    choice = os.environ.get("PFANN_LM_DEVICE")
    if choice == "0":
        return None
    apply_platform_override()
    import jax

    if choice != "1" and jax.default_backend() == "cpu":
        return None
    from pfann_tpu.landmark.device import DevicePeakExtractor

    if logger is not None:
        logger.info("landmark device extraction on %s", jax.default_backend())
    return DevicePeakExtractor()


def main() -> None:
    MultiProcessInitLogger("lmbuilder")()
    logger = get_logger()
    if len(sys.argv) < 3:
        print("Usage: python %s <music list> <db dir> [sample_rate]"
              % sys.argv[0])
        sys.exit()
    music_list, db_dir = sys.argv[1:3]
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

    files = read_file_list(music_list)
    extractor = make_extractor(logger)
    if extractor is not None:
        from pfann_tpu.landmark.device import as_device_input

    def signals():
        for i, path in enumerate(files):
            tm = time.time()
            try:
                wav = load_mono(path, sr)
            except Exception as e:
                logger.error("load %s error: %r", path, e)
                wav = __import__("numpy").zeros(0, dtype="float32")
            if extractor is not None:
                wav = as_device_input(wav)
            logger.info("load %s %.6fs", path, time.time() - tm)
            yield wav

    idx = LandmarkIndex.build(signals(), song_list=files,
                              extractor=extractor)
    idx.save(db_dir)
    print("landmark db: %d songs, %d hashes" % (idx.n_songs,
                                                idx.hashes.shape[0]))


if __name__ == "__main__":
    main()
