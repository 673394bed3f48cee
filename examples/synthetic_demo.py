#!/usr/bin/env python
"""Self-contained demo: synthesize a music corpus, train a tiny
fingerprinter, build a database, generate noisy queries, match them, and
print accuracy — no datasets needed.  Runs on TPU or CPU.

    python examples/synthetic_demo.py [workdir]

This is the minimum end-to-end slice of the framework (SURVEY.md section 7
milestone 3) wired through the real CLIs' code paths.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pfann_tpu.audio.io import write_wav  # noqa: E402
from pfann_tpu.utils.config import write_config  # noqa: E402
from pfann_tpu.utils.platform import apply_platform_override  # noqa: E402

# honor PFANN_PLATFORM / PFANN_COMPILE_CACHE exactly like the CLIs (the
# builder/matcher subprocesses below pick them up from the environment)
apply_platform_override()


def make_song(rng, n_sec, sr=8000):
    """Non-stationary synthetic 'music': a random chord sequence."""
    note = sr // 4
    x = np.zeros(n_sec * sr)
    t = np.arange(note) / sr
    env = np.minimum(np.minimum(np.arange(note), np.arange(note)[::-1]) / (note / 8), 1)
    for k in range(n_sec * 4):
        for _ in range(3):
            f = rng.uniform(150, 3400)
            x[k * note : (k + 1) * note] += (
                rng.uniform(0.3, 1.0) * env
                * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
            )
    return (x / (np.abs(x).max() * 1.2)).astype(np.float32)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pfann_demo")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    print("== workdir:", root)

    # 1. corpus ----------------------------------------------------------
    music_dir = os.path.join(root, "music")
    os.makedirs(music_dir, exist_ok=True)
    songs = []
    for i in range(8):
        wav = make_song(rng, 10)
        path = os.path.join(music_dir, "song%02d.wav" % i)
        write_wav(path, wav, 8000)
        songs.append((path, wav))
    print("== synthesized %d songs" % len(songs))

    # 2. tiny model, briefly trained on the corpus ------------------------
    import jax
    import jax.numpy as jnp
    import optax

    from pfann_tpu.data.musicdata import unfold
    from pfann_tpu.models.fp_network import build_fp_network
    from pfann_tpu.ops.melspec import build_mel_spec_layer
    from pfann_tpu.train.loss import similarity_loss
    from pfann_tpu.utils import checkpoint as ckpt

    model_dir = os.path.join(root, "model")
    os.makedirs(model_dir, exist_ok=True)
    cfg = {
        "model_dir": model_dir, "cache_dir": os.path.join(root, "caches"),
        "batch_size": 32, "sample_rate": 8000, "stft_n": 1024,
        "stft_hop": 256, "n_mels": 256, "f_min": 300, "f_max": 4000,
        "segment_size": 1, "hop_size": 0.5, "time_offset": 1.2,
        "pad_start": 0, "epoch": 1, "lr": 1e-3, "tau": 0.05,
        "cutout_min": 0.1, "cutout_max": 0.5,
        "model": {"d": 32, "h": 128, "u": 8, "fuller": True},
        "indexer": {"top_k": 10, "frame_shift_mul": 1},
    }
    cfg_path = os.path.join(model_dir, "configs.json")
    write_config(cfg, cfg_path)

    model = build_fp_network(cfg, compute_dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 256, 32)))
    mel = build_mel_spec_layer(cfg)
    segs = np.concatenate([unfold(w, 8000, 4000) for _, w in songs])
    segs = segs - segs.mean(axis=1, keepdims=True)
    tx = optax.adam(1e-3)  # 3e-3 collapses this tiny config
    opt_state = tx.init(variables)

    @jax.jit
    def step(v, o, x):
        loss, g = jax.value_and_grad(
            lambda vv: similarity_loss(model.apply(vv, mel(x)), 0.05)
        )(v)
        up, o = tx.update(g, o, v)
        return optax.apply_updates(v, up), o, loss

    for it in range(120):
        idx = rng.choice(segs.shape[0], 16, replace=False)
        org = segs[idx]
        aug = org + 0.15 * rng.standard_normal(org.shape).astype(np.float32)
        batch = np.stack([org, aug], 1).reshape(-1, 8000)
        variables, opt_state, loss = step(variables, opt_state, jnp.asarray(batch))
        if it % 40 == 0:
            print("  train it %3d  loss %.3f" % (it, float(loss)))
    ckpt.save_model(os.path.join(model_dir, "model.msgpack"), variables)
    print("== trained tiny model (loss %.3f)" % float(loss))

    # 3. build the database via the builder CLI ---------------------------
    lst = os.path.join(root, "db_list.txt")
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p, _ in songs)
    db_dir = os.path.join(root, "db")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "builder.py"), lst, db_dir, cfg_path],
        check=True, cwd=REPO,
    )
    print("== database built:", sorted(os.listdir(db_dir)))

    # 4. noisy queries -----------------------------------------------------
    qdir = os.path.join(root, "queries")
    os.makedirs(qdir, exist_ok=True)
    qlist = os.path.join(root, "qlist.txt")
    truths = []
    with open(qlist, "w") as f:
        for qi in range(10):
            sid = int(rng.integers(0, len(songs)))
            path, wav = songs[sid]
            start = int(rng.integers(0, len(wav) - 3 * 8000))
            q = wav[start : start + 3 * 8000].copy()
            q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
            qp = os.path.join(qdir, "q%02d.wav" % qi)
            write_wav(qp, q, 8000)
            f.write(qp + "\n")
            truths.append((path, start / 8000))

    # 5. match via the matcher CLI ----------------------------------------
    result = os.path.join(root, "result.txt")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matcher.py"), qlist, db_dir, result],
        check=True, cwd=REPO,
    )

    # 6. score -------------------------------------------------------------
    import csv

    correct = near = 0
    with open(os.path.splitext(result)[0] + "_detail.csv") as f:
        reader = csv.DictReader(f)
        for row, (ans, t0) in zip(reader, truths):
            ok = os.path.basename(row["answer"]) == os.path.basename(ans)
            correct += ok
            near += ok and abs(float(row["time"]) - t0) <= 0.5
    print("== song accuracy: %d/10, near (<=0.5 s): %d/10" % (correct, near))


if __name__ == "__main__":
    main()
