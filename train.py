#!/usr/bin/env python
"""Train the fingerprinter.

CLI parity with reference train.py:264-278:
    python train.py -p configs/default.json -w 4 [--mock]
"""

import argparse

from pfann_tpu.utils.platform import apply_platform_override

apply_platform_override()

from pfann_tpu.data.mock import MockedDataLoader
from pfann_tpu.train.trainer import Trainer
from pfann_tpu.utils import MultiProcessInitLogger, get_logger, read_config


def main() -> None:
    logger_init = MultiProcessInitLogger("train")
    logger_init()
    logger = get_logger()
    logger.info("logger init")

    args = argparse.ArgumentParser()
    args.add_argument("-p", "--params", default="configs/default.json")
    args.add_argument("-w", "--workers", type=int, default=4)
    args.add_argument("--mock", action="store_true")
    # green-field vs the reference (single GPU): data-parallel training
    # over every local device via a jax.sharding Mesh — params
    # replicated, batch rows sharded, XLA inserts the gradient psum
    # (pfann_tpu/train/trainer.py).  2*batch_size must divide the
    # device count.
    args.add_argument(
        "--dp", action="store_true",
        help="data-parallel over all local devices",
    )
    args = args.parse_args()
    logger.info(args)

    params = read_config(args.params)
    if args.mock:
        ADataLoader = MockedDataLoader
    else:
        from pfann_tpu.data.segments import SegmentedDataLoader

        ADataLoader = SegmentedDataLoader

    train_data = ADataLoader("train", params, num_workers=args.workers)
    print("training data contains %d samples" % len(train_data.dataset))
    val_data = ADataLoader("validate", params, num_workers=args.workers)
    val_data.shuffle = False
    val_data.eval_time_shift = True
    print("validation data contains %d samples" % len(val_data.dataset))

    mesh = None
    if args.dp:
        import jax

        from pfann_tpu.parallel.mesh import make_mesh

        n = jax.device_count()
        rows = 2 * params["batch_size"]
        if rows % n:
            raise SystemExit(
                "--dp needs 2*batch_size (%d) divisible by the device "
                "count (%d)" % (rows, n)
            )
        print("data-parallel over %d devices" % n)
        mesh = make_mesh("dp", n)

    trainer = Trainer(params, mesh=mesh)
    trainer.fit(train_data, val_data, config_path=args.params)


if __name__ == "__main__":
    main()
