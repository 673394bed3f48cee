#!/usr/bin/env python
"""Recognize queries using the standalone native matcher binary.

CLI parity with reference cppmatcher.py:31-139 (which piped embeddings to
the faiss-linked faisscputest binary):
    python cppmatcher.py <query list> <database dir> <result file>

Embeddings are computed on the accelerator (Embedder); each query's rows
are piped to native/matcher over the [u32 len][f32 data] / [i32 best]
wire protocol (faisscputest.cpp:140-151 compatible).
"""

import os
import struct
import subprocess
import sys
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.musicdata import MusicDataset
from pfann_tpu.index.database import MODEL_FILE_NAME
from pfann_tpu.index.embedder import Embedder
from pfann_tpu.index.native import build as build_native
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config, read_file_list


def matcher_binary() -> str:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native", "matcher")
    if not os.path.exists(path):
        build_native()
    return path


def main() -> None:
    MultiProcessInitLogger("cppmatcher")()
    logger = get_logger()
    if len(sys.argv) < 4:
        print("Usage: python %s <query list> <database dir> <result file>" % sys.argv[0])
        sys.exit()
    file_list_for_query, dir_for_db, result_file = sys.argv[1:4]
    params = read_config(os.path.join(dir_for_db, "configs.json"))

    print("loading model...")
    embedder = Embedder(params, os.path.join(dir_for_db, MODEL_FILE_NAME), chunk=512)
    print("model loaded")
    song_list = read_file_list(os.path.join(dir_for_db, "songList.txt"))

    proc = subprocess.Popen(
        [
            matcher_binary(), dir_for_db,
            str(params["indexer"]["top_k"]),
            str(params["indexer"].get("frame_shift_mul", 1)),
            str(params["indexer"].get("score_alpha", 0)),
        ],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
    )

    dataset = MusicDataset(file_list_for_query, params)
    tm_0 = time.time()
    with open(result_file, "w", encoding="utf8", newline="\n") as fout:
        for i, name, wav in dataset:
            if wav.shape[0] == 0:
                fout.write("%s\t%s\n" % (name, "error"))
                continue
            emb = embedder.embed(wav).astype(np.float32)
            proc.stdin.write(struct.pack("<I", emb.shape[0]))
            proc.stdin.write(emb.tobytes())
            proc.stdin.flush()
            (best,) = struct.unpack("<i", proc.stdout.read(4))
            ans = song_list[best] if best >= 0 else "error"
            fout.write("%s\t%s\n" % (name, ans))
            fout.flush()
    proc.stdin.close()
    proc.wait()
    logger.info("total query time %.6fs", time.time() - tm_0)


if __name__ == "__main__":
    main()
