#!/usr/bin/env python
"""Build a fingerprint database from a music list.

CLI parity with reference builder.py:25-148:
    python builder.py <music list file> <db location> [config or model dir]

DB directory layout (see pfann_tpu/index/database.py):
  embeddings / landmarkKey / songList.txt / configs.json — identical to
  the reference; model.msgpack replaces model.pt; index_meta.json replaces
  the faiss landmarkValue binary (the TPU engine searches the raw
  embedding matrix directly, so no ANN training step exists — the
  "train indexer" phase of the reference is gone by design).
"""

import os
import shutil
import sys
import time

import numpy as np

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.musicdata import MusicDataset
from pfann_tpu.index.database import MODEL_FILE_NAME, write_index_meta
from pfann_tpu.index.embedder import Embedder
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config


def main() -> None:
    logger_init = MultiProcessInitLogger("builder")
    logger_init()
    logger = get_logger()

    if len(sys.argv) < 3:
        print("Usage: python %s <music list file> <db location>" % sys.argv[0])
        sys.exit()
    file_list_for_db = sys.argv[1]
    dir_for_db = sys.argv[2]
    configs = sys.argv[3] if len(sys.argv) >= 4 else "configs/default.json"
    if os.path.isdir(configs):
        configs_path = os.path.join(configs, "configs.json")
        params = read_config(configs_path)
        params["model_dir"] = configs
        configs = configs_path
    else:
        params = read_config(configs)

    print("loading model...")
    model_path = os.path.join(params["model_dir"], MODEL_FILE_NAME)
    embedder = Embedder(params, model_path)
    print("model loaded")

    # DB is always built at base hop (builder.py:64)
    params["indexer"]["frame_shift_mul"] = 1
    dataset = MusicDataset(file_list_for_db, params)

    os.makedirs(dir_for_db, exist_ok=True)
    landmark_key = []
    total = 0
    with open(os.path.join(dir_for_db, "embeddings"), "wb") as emb_file:
        for i, name, wav in dataset.iterate(num_workers=4):
            tm_0 = time.time()
            if wav.shape[0] == 0:
                print("load %s error!" % name)
                landmark_key.append(0)
                continue
            z = embedder.embed(wav)
            emb_file.write(z.astype(np.float32).tobytes())
            total += z.shape[0]
            landmark_key.append(int(wav.shape[0]))
            logger.info("compute embedding %.6fs", time.time() - tm_0)
    print("total", total, "embeddings")
    if total == 0:
        print("The database is empty!")

    np.array(landmark_key, dtype=np.int32).tofile(
        os.path.join(dir_for_db, "landmarkKey")
    )
    shutil.copyfile(file_list_for_db, os.path.join(dir_for_db, "songList.txt"))
    shutil.copyfile(configs, os.path.join(dir_for_db, "configs.json"))
    shutil.copyfile(model_path, os.path.join(dir_for_db, MODEL_FILE_NAME))
    write_index_meta(dir_for_db, d=embedder.d, meta={"ntotal": total})


if __name__ == "__main__":
    main()
