"""Checkpoint / resume with the reference's on-disk contract.

Parity target: train.py:169-185,223-235 —
  * per-epoch ``checkpoint{N}.ckpt`` holding {epoch, model, optimizer}
  * retention: keep every 10th, delete N-10 otherwise
  * ``epochs.txt`` records the last finished epoch and gates auto-resume
  * ``date.txt`` pins the run name
  * final ``model.msgpack`` export (params only; replaces model.pt)

Serialization is flax msgpack (host numpy trees); orbax is unnecessary at
this model size (~17M params, <70 MB per checkpoint).
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax

MODEL_FILE_NAME = "model.msgpack"


def _to_host(tree):
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def save_checkpoint(model_dir: str, epoch: int, state: dict[str, Any]) -> str:
    """Write checkpoint{epoch}.ckpt and update epochs.txt; prune old
    checkpoints per the reference retention rule."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "checkpoint%d.ckpt" % epoch)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(_to_host(state)))
    if epoch % 10 != 0:
        try:
            os.unlink(os.path.join(model_dir, "checkpoint%d.ckpt" % (epoch - 10)))
        except OSError:
            pass
    with open(os.path.join(model_dir, "epochs.txt"), "w") as f:
        f.write("%d\n" % epoch)
    return path


def last_epoch(model_dir: str) -> int:
    """Last finished epoch per epochs.txt, or -1 (train.py:223-226)."""
    path = os.path.join(model_dir, "epochs.txt")
    if os.path.exists(path):
        with open(path) as f:
            return int(f.read().strip())
    return -1


def load_checkpoint(model_dir: str, epoch: int, target: dict[str, Any]):
    """Restore a checkpoint into the structure of ``target``."""
    path = os.path.join(model_dir, "checkpoint%d.ckpt" % epoch)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def save_model(path_or_dir: str, params) -> str:
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = os.path.join(path_or_dir, MODEL_FILE_NAME)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(_to_host(params)))
    return path


def load_model(path_or_dir: str, target):
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = os.path.join(path_or_dir, MODEL_FILE_NAME)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())
