#!/usr/bin/env python
"""Export serving weights (model.msgpack) from any training checkpoint.

The reference exports model.pt only when train.py runs to completion
(train.py:185); an interrupted or still-running job leaves only
checkpointN.ckpt files, which builder/matcher can't consume.  This tool
rebuilds the params pytree from the config, restores the requested (or
latest, per epochs.txt) checkpoint, and writes model_dir/model.msgpack —
the builder/matcher serving contract (utils/checkpoint.py).

    python tools/export_model.py <model dir> [epoch]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    model_dir = sys.argv[1]

    import jax
    import jax.numpy as jnp

    import pfann_tpu.utils.checkpoint as ckpt
    from pfann_tpu.models.fp_network import build_fp_network
    from pfann_tpu.utils import read_config

    params_cfg = read_config(os.path.join(model_dir, "configs.json"))
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else ckpt.last_epoch(
        model_dir
    )
    if epoch < 0:
        sys.exit("no finished epoch recorded in %s/epochs.txt" % model_dir)

    model = build_fp_network(params_cfg, compute_dtype=jnp.bfloat16)
    target = jax.jit(model.init)(
        jax.random.key(123), jnp.zeros((2, model.F, model.T))
    )
    # restore only the params subtree — the optimizer state's structure
    # depends on the tx config and isn't needed for serving
    import flax.serialization as fser

    with open(
        os.path.join(model_dir, "checkpoint%d.ckpt" % epoch), "rb"
    ) as f:
        raw = fser.msgpack_restore(f.read())
    params = fser.from_state_dict(target, raw["params"])
    path = ckpt.save_model(
        os.path.join(model_dir, ckpt.MODEL_FILE_NAME), params
    )
    print("exported epoch %d -> %s" % (epoch, path))


if __name__ == "__main__":
    main()
