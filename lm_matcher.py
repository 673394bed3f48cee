#!/usr/bin/env python
"""Match queries against a landmark database (the `lm*` models of
testall.sh; replaces the external `../pfa` matcher).

    python lm_matcher.py <query list> <db dir> <result file> [sample_rate]

Outputs (the contract ensemble/lmscore.py + tools/accuracy.py consume):
  <result>        TSV  query \t answer
  <result>.csv    query, answer, time   (CSV with header)
  <result>.bin    int32 [n_query, n_songs, 2]: col 0 = best offset
                  (frames), col 1 = vote score
"""

import csv
import sys
import time

import numpy as np

from pfann_tpu.landmark import LandmarkIndex
from pfann_tpu.landmark.core import HOP
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_file_list

from lm_builder import load_mono


def main() -> None:
    MultiProcessInitLogger("lmmatcher")()
    logger = get_logger()
    if len(sys.argv) < 4:
        print("Usage: python %s <query list> <db dir> <result file>"
              " [sample_rate]" % sys.argv[0])
        sys.exit()
    query_list, db_dir, result_file = sys.argv[1:4]
    sr = int(sys.argv[4]) if len(sys.argv) > 4 else 8000

    idx = LandmarkIndex.load(db_dir)
    queries = read_file_list(query_list)

    with open(result_file, "w", encoding="utf8", newline="\n") as fout, open(
        result_file + ".csv", "w", encoding="utf8", newline=""
    ) as fcsv, open(result_file + ".bin", "wb") as fbin:
        writer = csv.writer(fcsv)
        writer.writerow(["query", "answer", "time"])
        for path in queries:
            tm = time.time()
            try:
                wav = load_mono(path, sr)
            except Exception as e:
                logger.error("load %s error: %r", path, e)
                wav = np.zeros(0, dtype=np.float32)
            best, table = idx.query(wav)
            ans = idx.song_list[best] if best >= 0 else "error"
            t = table[best, 0] * HOP / sr if best >= 0 else 0.0
            fout.write("%s\t%s\n" % (path, ans))
            writer.writerow([path, ans, t])
            fbin.write(table.astype(np.int32).tobytes())
            logger.info("query %s %.6fs", path, time.time() - tm)
    logger.info("done: %d queries", len(queries))


if __name__ == "__main__":
    main()
