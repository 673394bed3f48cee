#!/usr/bin/env python
"""Convert a reference pfann ``model.pt`` (torch state dict) to a
pfann_tpu ``model.msgpack`` (flax params).

This is the migration path for users of the reference implementation:
models trained with stdio2016/pfann (including NAF checkpoints already
converted by the reference's tools/convert_naf_to_pfann.py) load directly
into this framework.

Layout mapping (reference model.py:14-130 -> pfann_tpu/models/fp_network):
  f.convs.{i}.conv1.weight [o, in, 1, k]   -> f/block{i}/conv1/kernel [1, k, in, o]
  f.convs.{i}.conv2.weight [o, in/g, k, 1] -> f/block{i}/conv2/kernel [k, 1, in/g, o]
  f.convs.{i}.ln*.weight   [C, F, T]       -> ln*/scale [F, T, C]
  g.linear1.weight [d*u, v, 1] (groups=d)  -> g/w1 [d, v, u]
  g.linear2.weight [d, u, 1]  (groups=d)   -> g/w2 [d, u, 1]

Note: a reference model saved while "hacked" (weight-flip SAME-padding
trick, model.py:38-52) must be un-hacked before export; normal training
never saves hacked weights.

    python tools/convert_pfann_torch.py <model.pt> <configs.json> <out.msgpack>
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_state_dict(state: dict, d: int, h: int, u: int) -> dict:
    """torch state dict (tensors or numpy) -> flax params tree."""

    def arr(key):
        t = state[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    blocks = {}
    i = 0
    while "f.convs.%d.conv1.weight" % i in state:
        p = "f.convs.%d." % i
        blocks["block%d" % i] = {
            "conv1": {
                "kernel": arr(p + "conv1.weight").transpose(2, 3, 1, 0),
                "bias": arr(p + "conv1.bias"),
            },
            "ln1": {
                "scale": arr(p + "ln1.weight").transpose(1, 2, 0),
                "bias": arr(p + "ln1.bias").transpose(1, 2, 0),
            },
            "conv2": {
                "kernel": arr(p + "conv2.weight").transpose(2, 3, 1, 0),
                "bias": arr(p + "conv2.bias"),
            },
            "ln2": {
                "scale": arr(p + "ln2.weight").transpose(1, 2, 0),
                "bias": arr(p + "ln2.bias").transpose(1, 2, 0),
            },
        }
        i += 1
    assert i == 8, "expected 8 conv blocks, found %d" % i

    v = h // d
    w1 = arr("g.linear1.weight")[:, :, 0].reshape(d, u, v).transpose(0, 2, 1)
    b1 = arr("g.linear1.bias").reshape(d, u)
    w2 = arr("g.linear2.weight").reshape(d, u, 1)
    b2 = arr("g.linear2.bias").reshape(d, 1)
    return {
        "params": {
            "f": blocks,
            "g": {"w1": w1, "b1": b1, "w2": w2, "b2": b2},
        }
    }


def main():
    args = argparse.ArgumentParser()
    args.add_argument("model_pt")
    args.add_argument("configs")
    args.add_argument("out")
    args = args.parse_args()

    import torch

    from pfann_tpu.utils import checkpoint as ckpt
    from pfann_tpu.utils import read_config

    params = read_config(args.configs)
    m = params["model"]
    state = torch.load(args.model_pt, map_location="cpu")
    if "model" in state and not any(k.startswith("f.") for k in state):
        state = state["model"]  # full checkpoint instead of state dict
    tree = convert_state_dict(state, m["d"], m["h"], m["u"])
    ckpt.save_model(args.out, tree)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
