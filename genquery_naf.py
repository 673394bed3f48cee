#!/usr/bin/env python
"""Generate NAF-style test queries: per-1-second-segment independent time
offsets (simulating the neural-audio-fp evaluation protocol).

CLI parity with reference genquery_naf.py — same interface as
genquery.py; the difference (genquery_naf.py:52-79) is that the clip is
cut into segment_size pieces, each piece gets an independent random shift
within +-(time_offset - segment), segments are de-meaned, and noise/IRs
are drawn per segment.
"""

import argparse
import csv
import json
import math
import os

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.audio.io import get_audio, write_wav
from pfann_tpu.audio.resample import resample
from pfann_tpu.data.ir import AIR, MicIRP
from pfann_tpu.data.noise import NoiseData
from pfann_tpu.utils import read_config, read_file_list


class QueryGenNAF:
    def __init__(self, music_dir, music_list, noise, air, micirp, params):
        self.music_dir = music_dir
        self.music_list = music_list
        self.noise = noise
        self.air = air
        self.micirp = micirp
        self.params = params
        self.sample_rate = params["sample_rate"]

    def generate(self, index):
        rng = np.random.default_rng(9000 + index)
        name = self.music_list[index % len(self.music_list)]
        audio, smprate = get_audio(os.path.join(self.music_dir, name))
        audio = audio.mean(axis=0)
        audio = resample(audio, smprate, self.sample_rate)

        # per-segment independent shifts (genquery_naf.py:52-66)
        seg = int(self.sample_rate * self.params["segment_size"])
        total_segs = max(audio.shape[0] // seg, 1)
        shift = int(self.sample_rate * self.params["time_offset"]) - seg
        crop_pos = rng.integers(-shift, shift + 1, total_segs)
        segs = []
        for i in range(total_segs):
            offset = int(crop_pos[i]) + seg * i
            piece = audio[max(0, offset) : max(0, offset + seg)]
            piece = np.pad(
                piece,
                (max(0, -offset), max(0, (offset + seg) - audio.shape[0])),
            )
            segs.append(piece[:seg])
        x = np.stack(segs)
        x = x - x.mean(axis=1, keepdims=True)

        snr_min = self.params["noise"]["snr_min"]
        snr_max = self.params["noise"]["snr_max"]
        snr = float("nan")
        if self.noise:
            x = self.noise.add_noises(rng, x, snr_min, snr_max)

        spec = np.fft.rfft(x, self.params["fftconv_n"])
        if self.air:
            idx = rng.integers(0, self.air.data.shape[0], x.shape[0])
            spec = spec * self.air.data[idx]
        if self.micirp:
            spec = spec * self.micirp.random_choose(rng, x.shape[0])
        x = np.fft.irfft(spec, self.params["fftconv_n"])[:, :seg]

        audio = x.reshape(-1)
        peak = np.max(np.abs(audio))
        if peak > 0:
            audio = audio / peak
        return name, 0.0, audio.astype(np.float32), snr, ""


def main() -> None:
    args = argparse.ArgumentParser()
    args.add_argument("-p", "--params", default="configs/default.json")
    args.add_argument("-l", "--length", type=float, default=1)
    args.add_argument("--num", type=int, default=10)
    args.add_argument("--mode", default="test", choices=["train", "validate", "test"])
    args.add_argument("-o", "--out", required=True)
    args.add_argument("--yes", action="store_true")
    args = args.parse_args()

    params = read_config(args.params)
    train_val = "validate" if args.mode == "test" else args.mode
    sample_rate = params["sample_rate"]
    win = (
        params["pad_start"] + args.length
        + params["air"]["length"] + params["micirp"]["length"]
    ) * sample_rate
    fftconv_n = 2048
    while fftconv_n < win:
        fftconv_n *= 2
    params["fftconv_n"] = fftconv_n

    noise = NoiseData(
        noise_dir=params["noise"]["dir"], list_csv=params["noise"][train_val],
        sample_rate=sample_rate, cache_dir=params["cache_dir"],
    )
    air = AIR(
        air_dir=params["air"]["dir"], list_csv=params["air"][train_val],
        length=params["air"]["length"], fftconv_n=fftconv_n, sample_rate=sample_rate,
    )
    micirp = MicIRP(
        mic_dir=params["micirp"]["dir"], list_csv=params["micirp"][train_val],
        length=params["micirp"]["length"], fftconv_n=fftconv_n, sample_rate=sample_rate,
    )
    music_list = read_file_list(params[args.mode + "_csv"])

    gen = QueryGenNAF(params["music_dir"], music_list, noise, air, micirp, params)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "expected.csv"), "w", encoding="utf8",
              newline="\n") as fout, open(
        os.path.join(args.out, "list.txt"), "w", encoding="utf8"
    ) as fout2:
        writer = csv.writer(fout)
        writer.writerow(["query", "answer", "time", "snr", "reverb"])
        for i in range(args.num):
            name, t0, sound, snr, reverb = gen.generate(i)
            safe_name = os.path.splitext(os.path.split(name)[1])[0]
            out_name = "q%04d_%s_snr%d_%s.wav" % (i + 1, safe_name, math.floor(snr), reverb)
            writer.writerow([out_name, name, t0, snr, reverb])
            path = os.path.join(args.out, out_name)
            write_wav(path, sound, gen.sample_rate)
            fout2.write(path + "\n")
    params["genquery"] = {"mode": args.mode, "length": args.length, "naf": True}
    with open(os.path.join(args.out, "configs.json"), "w") as fout:
        json.dump(params, fout, indent=2)


if __name__ == "__main__":
    main()
