#!/usr/bin/env python
"""Dump a few augmented training batches as listenable WAV files.

Parity: reference preview.py:13-43 (which used the legacy v1 loader) —
here wired to the current pipeline: takes the raw augmented waveform
pairs before the mel front-end and writes them interleaved so you can
audition what the model trains on.

    python preview.py -p configs/default.json -o preview_out [-n 3]
"""

import argparse
import os

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.audio.io import write_wav
from pfann_tpu.utils import read_config


def main():
    args = argparse.ArgumentParser()
    args.add_argument("-p", "--params", default="configs/default.json")
    args.add_argument("-o", "--out", default="preview_out")
    args.add_argument("-n", "--num-batches", type=int, default=3)
    args = args.parse_args()

    params = read_config(args.params)
    from pfann_tpu.data.segments import SegmentedDataLoader

    loader = SegmentedDataLoader("validate", params, num_workers=2)
    loader.shuffle = True
    loader.eval_time_shift = False
    loader.augmented = True
    loader.set_epoch(0)

    # intercept the device augment stage to recover waveforms (preview is
    # about listening, not spectrograms)
    ds = loader.dataset
    import jax
    import jax.numpy as jnp

    from pfann_tpu.data.shuffler import batched
    from pfann_tpu.ops.augment import add_noises, complex_bank, ir_convolve

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(1000)
    key = jax.random.key(777)
    it = batched(iter(loader.shuffler), loader.batch_size // 2)
    for b in range(args.num_batches):
        idx = next(it)
        x_org, x_aug = ds.get_batch(idx, False, rng)
        x_org = x_org.astype(np.float32) / 32768
        x_aug = x_aug.astype(np.float32) / 32768
        key, k1, k2 = jax.random.split(key, 3)
        if ds.noise is not None:
            x_aug = np.asarray(
                add_noises(
                    k1, jnp.asarray(x_aug), jnp.asarray(ds.noise.data),
                    params["noise"]["snr_min"], params["noise"]["snr_max"],
                )
            )
        if ds.air is not None or ds.micirp is not None:
            x_aug = np.asarray(
                ir_convolve(
                    k2, jnp.asarray(x_aug),
                    jnp.asarray(complex_bank(ds.air.data))
                    if ds.air is not None else None,
                    jnp.asarray(complex_bank(ds.micirp.data))
                    if ds.micirp is not None else None,
                    ds.fftconv_n,
                )
            )[:, ds.pad_start : ds.pad_start + ds.segment_size]
        # interleave org/aug, peak-normalize each segment for listening
        wav = np.stack([x_org, x_aug], axis=1).reshape(-1, ds.segment_size)
        wav = wav / np.maximum(np.abs(wav).max(axis=1, keepdims=True), 1e-9)
        out = os.path.join(args.out, "batch%d.wav" % b)
        write_wav(out, wav.reshape(-1)[: params["sample_rate"] * 30], params["sample_rate"])
        print("wrote", out)


if __name__ == "__main__":
    main()
