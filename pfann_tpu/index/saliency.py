"""Gradient-saliency visualization for matcher queries.

Parity target: reference matcher.py:118-125,133-155 — for each query,
backprop the embedding against itself (cotangent = z, i.e. the gradient
of ||z||^2/2) down to the mel spectrogram, then render a PNG where the
red channel is the inf-normalized |gradient| and the green channel is the
log-mel energy dimmed where saliency is high.  torchvision's save_image
is replaced by PIL; autograd by one jax.vjp through mel->encoder.

Enable with ``"visualize": true`` in the DB's indexer config or the
matcher's ``--visualize`` flag; PNGs land next to the result file.
"""

from __future__ import annotations

import math
import os

import numpy as np

# The reference hardcodes a 32-frame marker stride (matcher.py:154
# `grads[:,:,::32] = 0`), only right for its default stft_hop;
# saliency_image derives the stride from the actual per-segment frame
# count instead.


def saliency_image(grads: np.ndarray, specs: np.ndarray) -> np.ndarray:
    """grads/specs: [S, F, T] (per-segment mel gradients and mel values).

    Returns an RGB uint8 image [F, S*T, 3]: R = |grad| inf-normalized per
    (segment, frame) column, G = mel energy scaled to [0, 1] and dimmed
    by (1 - R), B = 0; frequency axis flipped so low frequencies sit at
    the bottom; a black column marks each segment boundary.
    """
    sal = np.abs(np.asarray(grads, dtype=np.float32))
    denom = np.maximum(sal.max(axis=1, keepdims=True), 1e-12)
    sal = sal / denom  # inf-norm over the frequency axis

    def tile(x):  # [S, F, T] -> [F, S*T]
        return np.transpose(x, (1, 0, 2)).reshape(x.shape[1], -1)

    red = tile(sal)
    energy = tile(np.asarray(specs, dtype=np.float32)) - math.log(1e-6)
    energy = energy / max(float(energy.max()), 1e-12)
    green = energy * (1.0 - red)
    img = np.stack([red, green, np.zeros_like(red)], axis=-1)
    img = img[::-1]  # low frequencies at the bottom
    img[:, :: grads.shape[2]] = 0  # segment-boundary markers
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_saliency_png(
    out_dir: str, query_name: str, grads: np.ndarray, specs: np.ndarray
) -> str:
    from PIL import Image

    path = os.path.join(out_dir, os.path.basename(query_name) + ".png")
    Image.fromarray(saliency_image(grads, specs), mode="RGB").save(path)
    return path
