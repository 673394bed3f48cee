"""Device mesh helpers.

The reference has no distributed layer at all (SURVEY.md section 2.3);
this framework's parallelism is green-field and uses two named axes:

  * ``dp`` — data parallelism for training (gradients psum over ICI)
  * ``db`` — database sharding for retrieval (each chip owns a slice of
    the embedding matrix / song set; results merge with one all_gather)

Multi-slice (DCN) would extend the same meshes via
``jax.distributed.initialize``; nothing below assumes a single slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis: str = "dp", n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
