#!/usr/bin/env python
"""Recognize queries against a fingerprint database.

CLI parity with reference matcher.py:28-168:
    python matcher.py <query list> <database dir> <result file>

Outputs (readme.md:123-184 contract):
  <result>             TSV: query path \t answer path
  <result stem>_detail.csv: query, answer, score, time
  <result>.bin         per-query [n_songs, 2] float32 (score, time) blocks
"""

import csv
import os
import sys
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.musicdata import MusicDataset
from pfann_tpu.index.database import MODEL_FILE_NAME, Database
from pfann_tpu.index.embedder import Embedder
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config


def main() -> None:
    logger_init = MultiProcessInitLogger("nnmatcher")
    logger_init()
    logger = get_logger()

    if len(sys.argv) < 4:
        print("Usage: python %s <query list> <database dir> <result file>" % sys.argv[0])
        sys.exit()
    file_list_for_query, dir_for_db, result_file = sys.argv[1:4]
    result_file2 = os.path.splitext(result_file)[0] + "_detail.csv"
    result_file_score = result_file + ".bin"
    params = read_config(os.path.join(dir_for_db, "configs.json"))

    print("loading model...")
    embedder = Embedder(
        params, os.path.join(dir_for_db, MODEL_FILE_NAME), chunk=128
    )
    print("model loaded")

    print("loading database...")
    db = Database(dir_for_db, params["indexer"], params["hop_size"])
    print("database loaded")

    dataset = MusicDataset(file_list_for_query, params)

    tm_0 = time.time()
    with open(result_file, "w", encoding="utf8", newline="\n") as fout, open(
        result_file2, "w", encoding="utf8", newline="\n"
    ) as fout2, open(result_file_score, "wb") as fout_score:
        detail_writer = csv.writer(fout2)
        detail_writer.writerow(["query", "answer", "score", "time", "part_scores"])
        for i, name, wav in dataset:
            logger.info("get query %s", name)
            tm_1 = time.time()
            if wav.shape[0] == 0:
                logger.error("load %s error!", name)
                fout.write("%s\t%s\n" % (name, "error"))
                fout.flush()
                detail_writer.writerow([name, "error", -float("inf"), 0])
                fout2.flush()
                fout_score.write(
                    np.zeros([len(db.songList), 2], dtype=np.float32).tobytes()
                )
                continue

            embeddings = embedder.embed(wav)
            tm_2 = time.time()
            logger.info("compute embedding %.6fs", tm_2 - tm_1)

            sco, (ans_id, tim), song_score = db.query_embeddings(embeddings)
            ans = db.songList[ans_id] if ans_id >= 0 else "error"

            fout.write("%s\t%s\n" % (name, ans))
            fout.flush()
            detail_writer.writerow([name, ans, sco, tim])
            fout2.flush()
            fout_score.write(song_score.tobytes())
    logger.info("total query time %.6fs", time.time() - tm_0)


if __name__ == "__main__":
    main()
