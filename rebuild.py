#!/usr/bin/env python
"""Re-index an existing database with different search settings, without
re-computing embeddings.

CLI parity with reference rebuild.py:24-68.  The reference re-trains a
faiss index from the raw ``embeddings`` file; the TPU engine searches the
embeddings directly, so "rebuilding" just rewrites index_meta.json from
the (possibly edited) configs.json indexer section and re-validates the
embedding file's shape against landmarkKey.
"""

import os
import sys

import numpy as np

from pfann_tpu.index.database import INDEX_META_NAME, write_index_meta
from pfann_tpu.utils import read_config


def main() -> None:
    if len(sys.argv) < 2:
        print("Usage: python %s <db location>" % sys.argv[0])
        sys.exit()
    dir_for_db = sys.argv[1]
    params = read_config(os.path.join(dir_for_db, "configs.json"))
    d = params["model"]["d"]

    print("loading embeddings")
    embeddings = np.fromfile(
        os.path.join(dir_for_db, "embeddings"), dtype=np.float32
    ).reshape([-1, d])
    counts = np.fromfile(os.path.join(dir_for_db, "landmarkKey"), dtype=np.int32)
    assert embeddings.shape[0] == counts.sum(), (
        "embeddings (%d) inconsistent with landmarkKey (%d)"
        % (embeddings.shape[0], counts.sum())
    )

    print("writing index metadata")
    indexer = dict(params.get("indexer", {}))
    indexer.pop("index_factory", None)  # faiss-only concept
    write_index_meta(dir_for_db, d=d, meta={"ntotal": int(embeddings.shape[0]), **indexer})
    print("index metadata written to", os.path.join(dir_for_db, INDEX_META_NAME))


if __name__ == "__main__":
    main()
