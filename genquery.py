#!/usr/bin/env python
"""Generate noisy/reverberant test queries + ground truth.

CLI parity with reference genquery.py:101-168:
    python genquery.py -p configs/xxx.json -l 10 --num 2000 --mode test -o outdir

The synthesis pipeline lives in :mod:`pfann_tpu.data.querygen`
(crop-with-context -> SNR-uniform noise -> room x mic reverb ->
inf-norm); this file is only argument plumbing.  Each query is seeded
9000 + index for reproducible evaluation sets (genquery.py:43).
"""

import argparse

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.querygen import (
    ClipSampler,
    QuerySetWriter,
    ReverbBank,
    confirm_overwrite,
    fft_block_len,
    load_eval_corpora,
    synthesize_query,
)
from pfann_tpu.utils import read_config, read_file_list


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-p", "--params", default="configs/default.json")
    ap.add_argument("-l", "--length", type=float, default=1,
                    help="query length in seconds")
    ap.add_argument("--num", type=int, default=10)
    ap.add_argument("--mode", default="test",
                    choices=["train", "validate", "test"])
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--yes", action="store_true",
                    help="overwrite without asking")
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    if not confirm_overwrite(args.out, args.yes):
        return

    params = read_config(args.params)
    split = "validate" if args.mode == "test" else args.mode
    params["fftconv_n"] = fft_block_len(params, args.length)
    noise, air, micirp = load_eval_corpora(params, split, params["fftconv_n"])
    reverb = ReverbBank(air, micirp, params["fftconv_n"])
    sampler = ClipSampler(
        params["sample_rate"], args.length, params["pad_start"]
    )
    snr_range = (params["noise"]["snr_min"], params["noise"]["snr_max"])
    music = read_file_list(params[args.mode + "_csv"])
    music_dir = params["music_dir"]

    writer = QuerySetWriter(args.out, params["sample_rate"])
    import os

    for i in range(args.num):
        rng = np.random.default_rng(9000 + i)
        source = music[i % len(music)]
        audio, t0, snr, room = synthesize_query(
            rng, os.path.join(music_dir, source), sampler, noise, reverb,
            snr_range,
        )
        writer.add(i, source, audio, t0, snr, room)
    params["genquery"] = {"mode": args.mode, "length": args.length}
    writer.close(params)


if __name__ == "__main__":
    main()
