#!/usr/bin/env python
"""Create an indexer-knob VARIANT of an existing DB directory.

Engine choice, screen tuning (screen_pool_k / screen_top_m /
screen_coarse_dtype), score_alpha, align_pad, frame_shift_mul etc. are
all query-time knobs — the embeddings are identical — so a variant
shares the base DB's files via symlink and differs only in the
configs.json indexer block (generalizes tools/make_fsm_db.py).  Usage:

    python tools/make_variant_db.py <src_db> <dst_db> '<indexer JSON>'
    python tools/make_variant_db.py out/dbs/synth_synth \
        out/dbs/alignctl_synth '{"screen": false}'

Used by the round-4 screened-engine validation: the same 20k-track DB
is matched once with the auto-activated screen engine and once with
the exhaustive align control ({"screen": false}) to prove per-SNR
accuracy parity (the faiss-IVF-validation role, reference
testall.sh:80-101).
"""

import json
import os
import sys


def make_variant(src: str, dst: str, overrides: dict) -> None:
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
    cfg.setdefault("indexer", {}).update(overrides)
    with open(os.path.join(dst, "configs.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print("%s -> %s (indexer %s)" % (src, dst, json.dumps(overrides)))


if __name__ == "__main__":
    make_variant(sys.argv[1], sys.argv[2], json.loads(sys.argv[3]))
