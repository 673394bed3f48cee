#!/usr/bin/env python
"""Build a (music, noise, mix) triplet dataset for training a denoiser.

Parity: reference denoise/createdataset.py:27-188 — for each track: crop
``length`` seconds (+pad_start context), mono+resample, de-mean, pick a
noise crop scaled to a random SNR (or gaussian noise when no corpus),
apply the SAME room+mic IRs to music and noise separately, crop, mix,
joint peak-normalize, write music/ mix/ noise/ WAVs + per-split CSV.

    python denoise/createdataset.py -d <music_dir> --noise <dir> --air <dir>
        --micirp <dir> -p configs/default.json -l 30 -o <out>
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pfann_tpu.audio.io import get_audio, write_wav  # noqa: E402
from pfann_tpu.audio.resample import resample  # noqa: E402
from pfann_tpu.data.ir import AIR, MicIRP  # noqa: E402
from pfann_tpu.data.noise import NoiseData  # noqa: E402
from pfann_tpu.utils import read_config  # noqa: E402


def make_triplet(rng, music_dir, name, noise_data, air, micirp, length, params):
    sample_rate = params["sample_rate"]
    music, smprate = get_audio(os.path.join(music_dir, name))

    sel = int(smprate * length)
    pad = int(smprate * params["pad_start"])
    if music.shape[1] > sel:
        t0 = int(rng.integers(0, music.shape[1] - sel))
        music = music[:, max(0, t0 - pad) : t0 + sel]
        music = np.pad(music, ((0, 0), (max(pad - t0, 0), 0)))
    else:
        music = np.pad(music, ((0, 0), (pad, sel - music.shape[1])))
    music = music.mean(axis=0)
    music = resample(music, smprate, sample_rate)

    sel = int(sample_rate * length)
    pad = int(sample_rate * params["pad_start"])
    if music.shape[0] > sel + pad:
        music = music[: sel + pad]
    else:
        music = np.pad(music, (0, sel + pad - music.shape[0]))

    music = music - music.mean()
    amp = float(np.sqrt((music**2).mean()))
    snr = rng.uniform(params["noise"]["snr_min"], params["noise"]["snr_max"])
    if noise_data:
        noise = noise_data.random_choose(rng, 1, music.shape[0])[0]
        noise_amp = float(np.sqrt((noise**2).mean()))
        noise = noise * (amp / max(noise_amp, 1e-12) * 10 ** (-0.05 * snr))
    else:
        noise = rng.normal(0.0, amp * 10 ** (-0.05 * snr), music.shape[0]).astype(
            np.float32
        )

    n = params["fftconv_n"]
    music_freq = np.fft.rfft(music, n)
    noise_freq = np.fft.rfft(noise, n)
    if air:
        aira, _ = air.random_choose_name(rng)
        music_freq *= aira
        noise_freq *= aira
    if micirp:
        mic = micirp.random_choose(rng, 1)[0]
        music_freq *= mic
        noise_freq *= mic
    music = np.fft.irfft(music_freq, n)[pad : pad + sel]
    noise = np.fft.irfft(noise_freq, n)[pad : pad + sel]
    mix = music + noise

    vol = max(np.abs(mix).max(), np.abs(music).max(), np.abs(noise).max(), 1e-12)
    return music / vol, noise / vol, mix / vol


def gen_for(train_val, args, params):
    sample_rate = params["sample_rate"]
    noise = air = micirp = None
    if args.noise:
        noise = NoiseData(
            noise_dir=args.noise, list_csv=params["noise"][train_val],
            sample_rate=sample_rate, cache_dir=params["cache_dir"],
        )
    if args.air:
        air = AIR(
            air_dir=args.air, list_csv=params["air"][train_val],
            length=params["air"]["length"], fftconv_n=params["fftconv_n"],
            sample_rate=sample_rate,
        )
    if args.micirp:
        micirp = MicIRP(
            mic_dir=args.micirp, list_csv=params["micirp"][train_val],
            length=params["micirp"]["length"], fftconv_n=params["fftconv_n"],
            sample_rate=sample_rate,
        )

    with open(params[train_val + "_csv"], "r") as fin:
        reader = csv.reader(fin)
        next(reader)
        music_list = [row[0] for row in reader]

    os.makedirs(args.out, exist_ok=True)
    for sub in ("music", "mix", "noise"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    with open(
        os.path.join(args.out, "denoise_" + train_val + ".csv"),
        "w", encoding="utf8", newline="\n",
    ) as fout:
        writer = csv.writer(fout)
        writer.writerow(["mix_path", "music_path", "noise_path", "duration"])
        for i, name in enumerate(music_list):
            rng = np.random.default_rng(5000 + i)
            music, noise_out, mix = make_triplet(
                rng, args.data, name, noise, air, micirp, args.length, params
            )
            base = os.path.splitext(os.path.split(name)[1])[0] + ".wav"
            writer.writerow(
                ["music/" + base, "mix/" + base, "noise/" + base, float(args.length)]
            )
            write_wav(os.path.join(args.out, "music", base), music, sample_rate)
            write_wav(os.path.join(args.out, "mix", base), mix, sample_rate)
            write_wav(os.path.join(args.out, "noise", base), noise_out, sample_rate)


def main():
    args = argparse.ArgumentParser()
    args.add_argument("-d", "--data", required=True)
    args.add_argument("--noise")
    args.add_argument("--air")
    args.add_argument("--micirp")
    args.add_argument("-p", "--params", default="configs/default.json")
    args.add_argument("-l", "--length", type=float, default=30)
    args.add_argument("-o", "--out", required=True)
    args = args.parse_args()

    params = read_config(args.params)
    sample_rate = params["sample_rate"]
    win = (
        params["pad_start"] + args.length
        + params["air"]["length"] + params["micirp"]["length"]
    ) * sample_rate
    fftconv_n = 2048
    while fftconv_n < win:
        fftconv_n *= 2
    params["fftconv_n"] = fftconv_n
    gen_for("train", args, params)
    gen_for("validate", args, params)


if __name__ == "__main__":
    main()
