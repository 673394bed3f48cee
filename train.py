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

    trainer = Trainer(params)
    trainer.fit(train_data, val_data, config_path=args.params)


if __name__ == "__main__":
    main()
