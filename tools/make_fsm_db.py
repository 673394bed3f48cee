#!/usr/bin/env python
"""Create a frame_shift_mul VARIANT of an existing DB directory.

fsm is a query-time knob (reference datautil/musicdata.py:87 unfolds the
query at hop/fsm; database.py:129-134 folds the finer offsets back), so
the variant shares the base DB's embeddings via symlink and differs only
in configs.json.  Usage:

    python tools/make_fsm_db.py out/dbs/synth_synth out/dbs/synth_fsm2 2
"""

import json
import os
import sys


def main() -> None:
    src, dst, fsm = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in ("embeddings", "landmarkKey", "songList.txt",
                 "index_meta.json", "model.msgpack"):
        link = os.path.join(dst, name)
        if os.path.lexists(link):
            os.remove(link)
        if os.path.exists(os.path.join(src, name)):
            os.symlink(os.path.relpath(os.path.join(src, name), dst), link)
    with open(os.path.join(src, "configs.json")) as f:
        cfg = json.load(f)
    cfg.setdefault("indexer", {})["frame_shift_mul"] = fsm
    with open(os.path.join(dst, "configs.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print("%s -> %s (frame_shift_mul=%d)" % (src, dst, fsm))


if __name__ == "__main__":
    main()
