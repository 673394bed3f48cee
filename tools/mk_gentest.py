#!/usr/bin/env python
"""Emit gentest configs for a synth corpus root (one per SNR).

The reference ships hand-written per-SNR gentest configs
(/root/reference/configs/gentest_snr*.json — identical except
snr_min=snr_max); for generated corpora we stamp them from a template
so every make_synth_corpus root gets its own query-generation configs:

    python tools/mk_gentest.py out/synth_r5 gentest_r5 --model flagship

writes configs/gentest_r5_snr{-6,-4,-2,0,2,4,6,8}.json pointing at
<root>/lists + <root>/music with the named model's dims (genquery only
reads the noise/air/micirp lists and the audio params, but the configs
double as matcher/builder configs so the model block must be right).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNRS = (-6, -4, -2, 0, 2, 4, 6, 8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="corpus root (out/synth_r5)")
    ap.add_argument("prefix", help="config name prefix (gentest_r5)")
    ap.add_argument("--model", default="flagship",
                    help="out/models/<name> whose configs.json supplies "
                    "the model/indexer blocks")
    ap.add_argument("--snrs", default=",".join(map(str, SNRS)))
    args = ap.parse_args()

    model_cfg = json.load(
        open(os.path.join("out/models", args.model, "configs.json"))
    )
    lists = os.path.join(args.root, "lists")
    for snr in (int(s) for s in args.snrs.split(",")):
        cfg = dict(model_cfg)
        cfg.update(
            train_csv=os.path.join(lists, "music_train.csv"),
            validate_csv=os.path.join(lists, "music_val.csv"),
            test_csv=os.path.join(lists, "music_test.csv"),
            music_dir=os.path.join(args.root, "music"),
            model_dir=os.path.join("out/models", args.model),
        )
        cfg["noise"] = dict(
            model_cfg["noise"],
            train=os.path.join(lists, "noise_train.csv"),
            validate=os.path.join(lists, "noise_val.csv"),
            dir=os.path.join(args.root, "noise"),
            snr_min=snr, snr_max=snr,
        )
        cfg["micirp"] = dict(
            model_cfg["micirp"],
            train=os.path.join(lists, "micirp_train.csv"),
            validate=os.path.join(lists, "micirp_val.csv"),
            dir=os.path.join(args.root, "micirp"),
        )
        cfg["air"] = dict(
            model_cfg["air"],
            train=os.path.join(lists, "air_train.csv"),
            validate=os.path.join(lists, "air_val.csv"),
            dir=os.path.join(args.root, "air"),
        )
        path = "configs/%s_snr%d.json" % (args.prefix, snr)
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2)
        print(path)


if __name__ == "__main__":
    main()
