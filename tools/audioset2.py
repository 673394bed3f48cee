#!/usr/bin/env python
"""Download AudioSet noise segments with yt-dlp + ffmpeg.

Parity: reference tools/audioset2.py — for each (ytid, start, end) row,
download the audio and cut the labelled span; failures leave an empty
placeholder file so reruns skip them.  Requires network + yt-dlp/ffmpeg
(gated — this sandbox has neither).
"""

import argparse
import csv
import os
import shutil
import subprocess


def have_tools() -> bool:
    return shutil.which("yt-dlp") is not None and shutil.which("ffmpeg") is not None


def main():
    args = argparse.ArgumentParser()
    args.add_argument("csv")
    args.add_argument("out_dir")
    args = args.parse_args()

    if not have_tools():
        raise SystemExit("audioset2 requires yt-dlp and ffmpeg on PATH")

    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.csv, encoding="utf8") as fin:
        for row in csv.reader(fin, skipinitialspace=True):
            if row[0].startswith("#"):
                continue
            ytid, start, end = row[0], float(row[1]), float(row[2])
            out = os.path.join(args.out_dir, "%s.wav" % ytid)
            if os.path.exists(out):
                continue
            try:
                tmp = os.path.join(args.out_dir, "%s.tmp.m4a" % ytid)
                subprocess.run(
                    ["yt-dlp", "-f", "bestaudio", "-o", tmp,
                     "https://www.youtube.com/watch?v=" + ytid],
                    check=True, timeout=300,
                )
                subprocess.run(
                    ["ffmpeg", "-y", "-i", tmp, "-ss", str(start),
                     "-t", str(end - start), out],
                    check=True, timeout=300,
                )
                os.unlink(tmp)
            except Exception as x:
                print("failed %s: %s" % (ytid, x))
                open(out, "wb").close()  # empty placeholder, don't retry


if __name__ == "__main__":
    main()
