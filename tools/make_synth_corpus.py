#!/usr/bin/env python
"""Generate a self-contained synthetic dataset for the per-SNR accuracy
harness (train / genall.sh / testall.sh run end-to-end with zero external
data).

Layout written under --root (default out/synth_dataset):
    music/s####.wav     structured "songs" (chord sequences + texture)
    noise/n###.wav      noise corpus (white / pink / AM-band / hum)
    air/room#.mat       room IRs in the Aachen .mat format (h_air key)
    micirp/mic#.wav     microphone IRs
    lists/music_train.csv / music_val.csv / music_test.csv
    lists/noise_train.csv / noise_val.csv
    lists/air_train.csv / air_val.csv / micirp_train.csv / micirp_val.csv
    lists/db.txt        DB build list (dummy songs + the test songs)

The companion configs are shipped in configs/synth.json and
configs/gentest_synth_snr*.json; testall.sh knows the dataset as
``synth``.  Mirrors the reference eval design (tools/fma_large.py:37-56:
a dummy-track DB + in-DB test tracks queried at every SNR).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pfann_tpu.audio.io import write_wav  # noqa: E402

SR = 8000


def make_song(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """A 'song': a chord sequence over a shared scale with per-chord
    envelopes plus a broadband texture floor.  Shared scale + dense DB
    makes retrieval non-trivial; the chord *sequence* is the fingerprint."""
    n = int(SR * seconds)
    scale = 300.0 * 2 ** (np.arange(36) / 12.0)  # 3 octaves from 300 Hz
    out = np.zeros(n, dtype=np.float32)
    t = 0
    while t < n:
        dur = int(SR * rng.uniform(0.25, 0.8))
        dur = min(dur, n - t)
        freqs = rng.choice(scale, size=rng.integers(2, 5), replace=False)
        amps = rng.uniform(0.15, 0.5, freqs.shape[0])
        phase = rng.uniform(0, 2 * np.pi, freqs.shape[0])
        tt = np.arange(dur, dtype=np.float32) / SR
        chord = (amps[:, None] * np.sin(
            2 * np.pi * freqs[:, None] * tt[None, :] + phase[:, None]
        )).sum(axis=0)
        env = np.minimum(1.0, np.minimum(
            np.arange(dur) / (0.02 * SR),
            np.arange(dur, 0, -1) / (0.1 * SR),
        )).astype(np.float32)
        out[t : t + dur] += chord.astype(np.float32) * env
        t += dur
    out += 0.03 * rng.standard_normal(n).astype(np.float32)
    return 0.6 * out / max(float(np.abs(out).max()), 1e-9)


def make_noise_clip(rng: np.random.Generator, kind: str, seconds: float
                    ) -> np.ndarray:
    n = int(SR * seconds)
    white = rng.standard_normal(n).astype(np.float32)
    if kind == "white":
        out = white
    elif kind == "pink":
        spec = np.fft.rfft(white)
        f = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
        out = np.fft.irfft(spec / np.sqrt(f), n).astype(np.float32)
    elif kind == "amband":
        spec = np.fft.rfft(white)
        f = np.fft.rfftfreq(n, 1 / SR)
        lo = rng.uniform(300, 1500)
        band = ((f > lo) & (f < lo * rng.uniform(1.5, 3.0))).astype(np.float32)
        carrier = np.fft.irfft(spec * band, n).astype(np.float32)
        am = 0.5 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(0.3, 3.0) * np.arange(n) / SR
        ).astype(np.float32)
        out = carrier * am
    else:  # hum: mains fundamental + harmonics + a white floor
        f0 = rng.choice([50.0, 60.0])
        tt = np.arange(n, dtype=np.float32) / SR
        out = sum(
            rng.uniform(0.2, 1.0) / (k + 1)
            * np.sin(2 * np.pi * f0 * (k + 1) * tt + rng.uniform(0, 6.28))
            for k in range(6)
        ).astype(np.float32) + 0.1 * white
    return 0.5 * out / max(float(np.abs(out).max()), 1e-9)


def make_room_ir(rng: np.random.Generator, rt60: float) -> np.ndarray:
    n = int(SR * 0.8)
    h = np.zeros(n)
    h[0] = 1.0
    tail = rng.standard_normal(n) * np.exp(
        -3.0 * np.log(10) * np.arange(n) / (rt60 * SR)
    )
    h += rng.uniform(0.1, 0.4) * tail
    return h


def make_mic_ir(rng: np.random.Generator) -> np.ndarray:
    n = int(SR * 0.25)
    h = np.zeros(n, np.float32)
    h[0] = 1.0
    # a short colored tail = mic/speaker coloration
    k = int(SR * 0.01)
    h[1 : k + 1] = rng.uniform(-0.3, 0.3, k) * np.exp(-np.arange(k) / (0.002 * SR))
    return h


def write_csv(path: str, names: list[str]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"])
        w.writerows([[n] for n in names])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="out/synth_dataset")
    ap.add_argument("--train-songs", type=int, default=60)
    ap.add_argument("--val-songs", type=int, default=10)
    ap.add_argument("--db-songs", type=int, default=100,
                    help="dummy DB tracks (never queried)")
    ap.add_argument("--test-songs", type=int, default=30,
                    help="in-DB tracks the queries are cut from")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=3)  # fma_large.py:39
    args = ap.parse_args()

    root = args.root
    for sub in ("music", "noise", "air", "micirp", "lists"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(args.seed)

    groups = {
        "train": args.train_songs,
        "val": args.val_songs,
        "db": args.db_songs,
        "test": args.test_songs,
    }
    names: dict[str, list[str]] = {}
    i = 0
    for group, count in groups.items():
        names[group] = []
        for _ in range(count):
            name = "s%04d.wav" % i
            write_wav(
                os.path.join(root, "music", name),
                make_song(rng, args.seconds), SR,
            )
            names[group].append(name)
            i += 1
    lists = os.path.join(root, "lists")
    write_csv(os.path.join(lists, "music_train.csv"), names["train"])
    write_csv(os.path.join(lists, "music_val.csv"), names["val"])
    write_csv(os.path.join(lists, "music_test.csv"), names["test"])
    with open(os.path.join(lists, "db.txt"), "w") as f:
        for name in names["db"] + names["test"]:
            f.write(os.path.join(root, "music", name) + "\n")

    kinds = ["white", "pink", "amband", "hum"]
    noise_names = []
    for j in range(24):
        name = "n%03d.wav" % j
        write_wav(
            os.path.join(root, "noise", name),
            make_noise_clip(rng, kinds[j % len(kinds)], 10.0), SR,
        )
        noise_names.append(name)
    write_csv(os.path.join(lists, "noise_train.csv"), noise_names[:16])
    write_csv(os.path.join(lists, "noise_val.csv"), noise_names[16:])

    import scipy.io

    air_names = []
    for j, rt60 in enumerate((0.12, 0.25, 0.4, 0.6)):
        name = "room%d.mat" % j
        scipy.io.savemat(
            os.path.join(root, "air", name),
            {
                "h_air": make_room_ir(rng, rt60)[None, :],
                "air_info": {"fs": np.array([[SR]]), "room": "room%d" % j},
            },
        )
        air_names.append(name)
    write_csv(os.path.join(lists, "air_train.csv"), air_names[:2])
    write_csv(os.path.join(lists, "air_val.csv"), air_names[2:])

    mic_names = []
    for j in range(3):
        name = "mic%d.wav" % j
        write_wav(os.path.join(root, "micirp", name), make_mic_ir(rng), SR)
        mic_names.append(name)
    write_csv(os.path.join(lists, "micirp_train.csv"), mic_names[:2])
    write_csv(os.path.join(lists, "micirp_val.csv"), mic_names[2:])

    total = sum(groups.values())
    print("synth corpus at %s: %d songs x %.0f s, %d noise clips, "
          "%d rooms, %d mics" % (root, total, args.seconds, len(noise_names),
                                 len(air_names), len(mic_names)))


if __name__ == "__main__":
    main()
