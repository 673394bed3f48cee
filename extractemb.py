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
    hop = dataset.hop_size // dataset.frame_shift_mul
    with open(os.path.join(out_embed_dir, "query_embeddings"), "wb") as emb_file, \
         open(os.path.join(out_embed_dir, "query_index"), "wb") as idx_file:
        if embedder.can_pack(hop):
            # packed pipelined path: raw audio H2D + device unfold,
            # batches in flight while the next queries decode
            stream = embedder.embed_stream(dataset, hop, num_workers=4)
        else:
            def _seg_stream():
                for i, name, wav in dataset.iterate(num_workers=4):
                    yield i, name, embedder.embed(wav) if wav.shape[0] \
                        else np.zeros((0, embedder.d), np.float32)

            stream = _seg_stream()
        for i, name, z in stream:
            if z.shape[0] == 0:
                logger.error("load %s error!", name)
            emb_file.write(np.ascontiguousarray(z, np.float32).tobytes())
            idx_file.write(
                np.array([idx_pos, z.shape[0]], dtype=np.int64).tobytes()
            )
            idx_pos += z.shape[0]
    print("total", idx_pos, "embeddings")
    shutil.copyfile(file_list_for_query, os.path.join(out_embed_dir, "queryList.txt"))
    shutil.copyfile(configs, os.path.join(out_embed_dir, "configs.json"))
    logger.info("total extract time %.6fs", time.time() - tm_0)


if __name__ == "__main__":
    main()
