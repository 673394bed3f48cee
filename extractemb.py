#!/usr/bin/env python
"""Extract query embeddings once, to be matched against many index
configurations (thesis pipeline stage 1).

CLI parity with reference extractemb.py:17-96:
    python extractemb.py <query list> <database dir> <output embedding dir>

Output dir: query_embeddings (raw f32), query_index (int64 [start, len]
pairs; errors recorded as len 0), queryList.txt, configs.json.
"""

import os
import shutil
import sys
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.musicdata import MusicDataset
from pfann_tpu.index.database import MODEL_FILE_NAME
from pfann_tpu.index.embedder import Embedder
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config


def main() -> None:
    MultiProcessInitLogger("nnextract")()
    logger = get_logger()
    if len(sys.argv) < 4:
        print("Usage: python %s <query list> <database dir> <output embedding dir>"
              % sys.argv[0])
        sys.exit()
    file_list_for_query, dir_for_db, out_embed_dir = sys.argv[1:4]
    configs = os.path.join(dir_for_db, "configs.json")
    params = read_config(configs)

    print("loading model...")
    embedder = Embedder(params, os.path.join(dir_for_db, MODEL_FILE_NAME), chunk=512)
    print("model loaded")

    dataset = MusicDataset(file_list_for_query, params)
    os.makedirs(out_embed_dir, exist_ok=True)
    tm_0 = time.time()
    idx_pos = 0
    with open(os.path.join(out_embed_dir, "query_embeddings"), "wb") as emb_file, \
         open(os.path.join(out_embed_dir, "query_index"), "wb") as idx_file:
        for i, name, wav in dataset.iterate(num_workers=4):
            tm_1 = time.time()
            if wav.shape[0] == 0:
                logger.error("load %s error!", name)
                idx_file.write(np.array([idx_pos, 0], dtype=np.int64).tobytes())
                continue
            z = embedder.embed(wav)
            emb_file.write(z.astype(np.float32).tobytes())
            idx_file.write(
                np.array([idx_pos, z.shape[0]], dtype=np.int64).tobytes()
            )
            idx_pos += z.shape[0]
            logger.info("compute embedding %.6fs", time.time() - tm_1)
    print("total", idx_pos, "embeddings")
    shutil.copyfile(file_list_for_query, os.path.join(out_embed_dir, "queryList.txt"))
    shutil.copyfile(configs, os.path.join(out_embed_dir, "configs.json"))
    logger.info("total extract time %.6fs", time.time() - tm_0)


if __name__ == "__main__":
    main()
