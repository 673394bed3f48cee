#!/usr/bin/env python
"""Generate noisy/reverberant test queries + ground truth.

CLI parity with reference genquery.py:101-168:
    python genquery.py -p configs/xxx.json -l 10 --num 2000 --mode test -o outdir

Per-query pipeline (genquery.py:42-96): deterministic per-index seed
(9000 + index) -> random crop of query_len seconds (pad_start of context
kept on the left) -> mono + resample -> noise at U[snr_min, snr_max]
(name recorded) -> AIR room IR x microphone IR in the frequency domain
-> inf-norm -> 16-bit WAV.  Outputs expected.csv (query, answer, time,
snr, reverb), list.txt, configs.json snapshot.
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


class QueryGen:
    def __init__(self, music_dir, music_list, noise, air, micirp,
                 query_len, num_queries, params):
        self.music_dir = music_dir
        self.music_list = music_list
        self.noise = noise
        self.air = air
        self.micirp = micirp
        self.query_len = query_len
        self.num_queries = num_queries
        self.params = params
        self.pad_start = params["pad_start"]
        self.sample_rate = params["sample_rate"]

    def generate(self, index):
        rng = np.random.default_rng(9000 + index)  # genquery.py:43
        name = self.music_list[index % len(self.music_list)]
        audio, smprate = get_audio(os.path.join(self.music_dir, name))

        # crop a clip, keeping pad_start of left context for reverb
        sel_smp = int(smprate * self.query_len)
        pad_smp = int(smprate * self.pad_start)
        if audio.shape[1] >= sel_smp:
            time_offset = int(rng.integers(0, audio.shape[1] - sel_smp))
            audio = audio[:, max(0, time_offset - pad_smp) : time_offset + sel_smp]
            audio = np.pad(audio, ((0, 0), (max(pad_smp - time_offset, 0), 0)))
        else:
            time_offset = 0
            audio = np.pad(audio, ((0, 0), (pad_smp, sel_smp - audio.shape[1])))

        audio = audio.mean(axis=0)
        audio = resample(audio, smprate, self.sample_rate)

        sel_smp = int(self.sample_rate * self.query_len)
        pad_smp = int(self.sample_rate * self.pad_start)
        if audio.shape[0] > sel_smp + pad_smp:
            audio = audio[: sel_smp + pad_smp]
        else:
            audio = np.pad(audio, (0, sel_smp + pad_smp - audio.shape[0]))

        snr = float("nan")
        if self.noise:
            audio, _, snr = self.noise.add_noises(
                rng, audio[None, :],
                self.params["noise"]["snr_min"], self.params["noise"]["snr_max"],
                out_name=True,
            )
            audio = audio[0]
            snr = float(snr[0])

        spec = np.fft.rfft(audio, self.params["fftconv_n"])
        reverb = ""
        if self.air:
            aira, reverb = self.air.random_choose_name(rng)
            spec = spec * aira
        if self.micirp:
            spec = spec * self.micirp.random_choose(rng, 1)[0]
        audio = np.fft.irfft(spec, self.params["fftconv_n"])
        audio = audio[pad_smp : pad_smp + sel_smp]

        peak = np.max(np.abs(audio))
        if peak > 0:
            audio = audio / peak
        return name, time_offset / smprate, audio.astype(np.float32), snr, reverb


def main() -> None:
    args = argparse.ArgumentParser()
    args.add_argument("-p", "--params", default="configs/default.json")
    args.add_argument("-l", "--length", type=float, default=1)
    args.add_argument("--num", type=int, default=10)
    args.add_argument("--mode", default="test", choices=["train", "validate", "test"])
    args.add_argument("-o", "--out", required=True)
    args.add_argument("--yes", action="store_true", help="overwrite without asking")
    args = args.parse_args()

    if os.path.exists(args.out) and not args.yes:
        yesno = input("Folder %s exists, overwrite anyway? (y/n) " % args.out)
        while yesno not in {"y", "n"}:
            yesno = input("Please enter y or n: ")
        if yesno == "n":
            return

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

    gen = QueryGen(
        params["music_dir"], music_list, noise, air, micirp,
        args.length, args.num, params,
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "expected.csv"), "w", encoding="utf8",
              newline="\n") as fout, open(
        os.path.join(args.out, "list.txt"), "w", encoding="utf8"
    ) as fout2:
        writer = csv.writer(fout)
        writer.writerow(["query", "answer", "time", "snr", "reverb"])
        for i in range(args.num):
            name, time_offset, sound, snr, reverb = gen.generate(i)
            safe_name = os.path.splitext(os.path.split(name)[1])[0]
            out_name = "q%04d_%s_snr%d_%s.wav" % (i + 1, safe_name, math.floor(snr), reverb)
            writer.writerow([out_name, name, time_offset, snr, reverb])
            path = os.path.join(args.out, out_name)
            write_wav(path, sound, gen.sample_rate)
            fout2.write(path + "\n")

    params["genquery"] = {"mode": args.mode, "length": args.length}
    with open(os.path.join(args.out, "configs.json"), "w") as fout:
        json.dump(params, fout, indent=2)


if __name__ == "__main__":
    main()
