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
from pfann_tpu.landmark.core import HOP, extract_hashes, pair_peaks
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_file_list

from lm_builder import load_mono, make_extractor


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
    extractor = make_extractor(logger)
    batch = extractor.batch if extractor is not None else 1

    def hash_batch(paths):
        """[(hashes, t_anchor)] per query — spectrogram/peaks batched on
        the accelerator when available, numpy otherwise."""
        wavs = []
        for path in paths:
            try:
                wavs.append(load_mono(path, sr))
            except Exception as e:
                logger.error("load %s error: %r", path, e)
                wavs.append(np.zeros(0, dtype=np.float32))
        if extractor is None:
            return [extract_hashes(w) for w in wavs]
        from pfann_tpu.landmark.device import as_device_input

        peaks = extractor.extract([as_device_input(w) for w in wavs])
        return [pair_peaks(p) for p in peaks]

    with open(result_file, "w", encoding="utf8", newline="\n") as fout, open(
        result_file + ".csv", "w", encoding="utf8", newline=""
    ) as fcsv, open(result_file + ".bin", "wb") as fbin:
        writer = csv.writer(fcsv)
        writer.writerow(["query", "answer", "time"])
        for at in range(0, len(queries), batch):
            chunk = queries[at : at + batch]
            tm = time.time()
            hashed = hash_batch(chunk)
            for path, (h, tq) in zip(chunk, hashed):
                best, table = idx.query_hashes(h, tq)
                ans = idx.song_list[best] if best >= 0 else "error"
                t = table[best, 0] * HOP / sr if best >= 0 else 0.0
                fout.write("%s\t%s\n" % (path, ans))
                writer.writerow([path, ans, t])
                fbin.write(table.astype(np.int32).tobytes())
            logger.info("query batch %d+%d %.6fs", at, len(chunk),
                        time.time() - tm)
    logger.info("done: %d queries", len(queries))


if __name__ == "__main__":
    main()
