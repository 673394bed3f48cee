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

Unlike the reference's per-song device loop (builder.py:88-100: one mel
+model call per 32-segment split), songs are PACKED into shared embed
chunks: a 30 s song is ~59 segments while the TPU embed chunk is 2048
rows, so per-song dispatch wastes ~97% of each call — and on the
tunneled sandbox TPU each call costs a fixed host-sync RTT.  Packing
~34 songs per call is a ~30x cut in device round trips; per-song
landmarkKey counts and write order are unchanged.  The build prints a
final ``build stats`` JSON line (decode/embed/write wall-clock split +
audio-s/s and embeddings/s) — the DB-build throughput metric of
BASELINE.json, captured by ``bench.py --build``.
"""

import json
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


def build_embeddings(
    embedder, dataset, emb_file, hop_size: float, num_workers: int = 4,
    depth: int = 8,
) -> dict:
    """The build hot loop: decode stream -> packed embed dispatches ->
    raw f32 append, strictly in list order.  Returns {landmark_key,
    total, stats} where stats is the decode/embed/write phase split
    (seconds) plus audio-seconds processed.

    Two device layouts:
      * packed-song (default when hop | segment): RAW audio crosses the
        host->device boundary (int16 when exact) and the overlap unfold
        + per-segment de-mean run on device (Embedder.embed_songs_device)
        — 4x fewer tunnel bytes than shipping host-unfolded f32 segments
        at hop=segment/2, which measured as the build bottleneck (~25
        MB/s H2D).  Dispatches are pipelined ``depth`` deep (default 8,
        matching the serving bench's dispatch depth — round 4 measured
        the build wall 99.6% embed-dispatch at depth 2, i.e. RTT-bound;
        override with PFANN_BUILD_DEPTH) so decode and the gather D2H of
        older batches overlap the in-flight round trips.
      * segment fallback (exotic hop): host unfold + embedder.embed.
    """
    logger = get_logger()
    landmark_key: list[int] = []
    total = 0
    audio_s = 0.0
    stats = {"decode_s": 0.0, "embed_s": 0.0, "write_s": 0.0}
    # the dataset's own unfold stride (hop / frame_shift_mul) — builder
    # forces fsm=1 (reference builder.py:64) but derive it anyway so the
    # packed layout can never disagree with load_raw's segment counts
    hop_samples = dataset.hop_size // dataset.frame_shift_mul
    packed = embedder.can_pack(hop_samples)

    if packed:
        for i, name, z in embedder.embed_stream(
            dataset, hop_samples, num_workers=num_workers, stats=stats,
            depth=depth,
        ):
            if z.shape[0] == 0:
                print("load %s error!" % name)
            landmark_key.append(int(z.shape[0]))
            audio_s += z.shape[0] * hop_size
            tm = time.time()
            emb_file.write(np.ascontiguousarray(z, np.float32).tobytes())
            stats["write_s"] += time.time() - tm
            total += z.shape[0]
    else:
        pending: list[np.ndarray] = []
        pending_rows = 0
        target = max(int(embedder.chunk), 1)

        def flush_seg():
            nonlocal pending, pending_rows, total
            if not pending:
                return
            tm = time.time()
            z = embedder.embed(np.concatenate(pending))
            stats["embed_s"] += time.time() - tm
            tm = time.time()
            emb_file.write(z.astype(np.float32).tobytes())
            stats["write_s"] += time.time() - tm
            total += z.shape[0]
            pending = []
            pending_rows = 0

        tm_decode = time.time()
        for i, name, wav in dataset.iterate(num_workers=num_workers):
            stats["decode_s"] += time.time() - tm_decode
            if wav.shape[0] == 0:
                print("load %s error!" % name)
                landmark_key.append(0)
                tm_decode = time.time()
                continue
            landmark_key.append(int(wav.shape[0]))
            audio_s += wav.shape[0] * hop_size
            pending.append(wav)
            pending_rows += wav.shape[0]
            if pending_rows >= target:
                flush_seg()
            tm_decode = time.time()
        flush_seg()
    stats["audio_s"] = audio_s
    stats["packed"] = packed
    logger.info(
        "build stats decode %.3fs embed %.3fs write %.3fs audio %.1fs",
        stats["decode_s"], stats["embed_s"], stats["write_s"], audio_s,
    )
    return {"landmark_key": landmark_key, "total": total, "stats": stats}


def main() -> None:
    logger_init = MultiProcessInitLogger("builder")
    logger_init()

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
    tm_0 = time.time()
    depth = int(os.environ.get("PFANN_BUILD_DEPTH", "8"))
    with open(os.path.join(dir_for_db, "embeddings"), "wb") as emb_file:
        out = build_embeddings(
            embedder, dataset, emb_file, hop_size=params["hop_size"],
            depth=depth,
        )
    landmark_key, total = out["landmark_key"], out["total"]
    wall = time.time() - tm_0
    stats = dict(out["stats"], wall_s=wall, total_embeddings=total,
                 n_songs=len(landmark_key))
    print("total", total, "embeddings")
    print("build stats %s" % json.dumps(stats))
    if total == 0:
        print("The database is empty!")

    np.array(landmark_key, dtype=np.int32).tofile(
        os.path.join(dir_for_db, "landmarkKey")
    )
    shutil.copyfile(file_list_for_db, os.path.join(dir_for_db, "songList.txt"))
    shutil.copyfile(configs, os.path.join(dir_for_db, "configs.json"))
    shutil.copyfile(model_path, os.path.join(dir_for_db, MODEL_FILE_NAME))
    meta = {"ntotal": total}
    # size the alignment layout pad at BUILD time: indexer.max_query_sec
    # becomes the layout's leading-zero row count (recorded in
    # index_meta so every later load serves queries that long on the
    # fast engines instead of the 320x-slower topk fallback,
    # BENCH_r04_long.json).  Cost: +pad rows/song of HBM at load —
    # pad=128 (60 s queries) is ~32 KB/song in bf16 at d=128 (~1 GB on
    # a 30k-track DB).  (Reference long-query striding:
    # datautil/musicdata.py:87.)
    max_q = params["indexer"].get("max_query_sec")
    if max_q:
        windows = int(np.ceil(float(max_q) / params["hop_size"]))
        # multiple of 8 satisfies the layout's sublane rounding and the
        # screen engine's pad % pool_k == 0 constraint (k defaults to 4)
        meta["align_pad"] = max(-(-windows // 8) * 8, 32)
        print("align_pad %d (max_query_sec %.1f)"
              % (meta["align_pad"], float(max_q)))
    write_index_meta(dir_for_db, d=embedder.d, meta=meta)


if __name__ == "__main__":
    main()
