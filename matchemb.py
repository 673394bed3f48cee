#!/usr/bin/env python
"""Match pre-extracted query embeddings against a database (thesis
pipeline stage 2).

CLI parity with reference matchemb.py:16-85:
    python matchemb.py <query embedding dir> <database dir> <result file>
"""

import csv
import os
import sys
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.index.database import Database
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config, read_file_list


def main() -> None:
    MultiProcessInitLogger("matchemb")()
    logger = get_logger()
    if len(sys.argv) < 4:
        print("Usage: python %s <query embedding dir> <database dir> <result file>"
              % sys.argv[0])
        sys.exit()
    dir_for_query, dir_for_db, result_file = sys.argv[1:4]
    result_file2 = os.path.splitext(result_file)[0] + "_detail.csv"
    params = read_config(os.path.join(dir_for_db, "configs.json"))
    file_list = read_file_list(os.path.join(dir_for_query, "queryList.txt"))
    logger.info("command args: %s", sys.argv)

    d = params["model"]["d"]
    print("loading database...")
    db = Database(dir_for_db, params["indexer"], params["hop_size"])
    print("database loaded")

    print("loading queries")
    query_embeddings = np.fromfile(
        os.path.join(dir_for_query, "query_embeddings"), dtype=np.float32
    ).reshape([-1, d])
    query_index = np.fromfile(
        os.path.join(dir_for_query, "query_index"), dtype=np.int64
    ).reshape([-1, 2])
    print("queries loaded")

    tm_0 = time.time()
    with open(result_file, "w", encoding="utf8", newline="\n") as fout, open(
        result_file2, "w", encoding="utf8", newline="\n"
    ) as fout2, open(result_file + ".bin", "wb") as fout_score:
        detail_writer = csv.writer(fout2)
        detail_writer.writerow(["query", "answer", "score", "time", "part_scores"])
        for i, name in enumerate(file_list):
            start, length = query_index[i]
            embeddings = query_embeddings[start : start + length]
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
