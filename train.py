#!/usr/bin/env python
"""Training entry point.

Mirrors the reference CLI (reference train.py:251-289):

    python train.py --config conf/train/pretrain.yaml [--weights W] [--resume]

Differences from the reference, by design: no mp.spawn / process-per-GPU —
a single process drives every local TPU device through a jitted, GSPMD-
sharded train step; the ``--port`` flag is accepted for CLI compatibility
but unused (there is no rendezvous server).
"""

import argparse
import os
import shutil

from rpeflow_tpu.train.config import load_config
from rpeflow_tpu.train.trainer import Trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="Path to the config")
    parser.add_argument("--weights", default=None,
                        help="Initial weights (.pt reference ckpt or orbax dir)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume epoch/step/best-metrics from --weights")
    parser.add_argument("--port", default=None,
                        help="Unused; kept for reference CLI compatibility")
    parser.add_argument("--overrides", nargs="*", default=[],
                        help="Dotted config overrides, e.g. training.max_epochs=10")
    args = parser.parse_args()

    cfgs = load_config(args.config, args.overrides)
    if args.weights is not None:
        cfgs.ckpt.path = args.weights
        cfgs.ckpt.resume = args.resume

    import sys

    log_dir = str(cfgs.log.dir)
    if os.path.exists(log_dir) and not cfgs.ckpt.resume:
        if sys.stdin.isatty():
            ans = input(f"Log dir {log_dir} exists. Overwrite? [y/N] ")
            if ans.lower() != "y":
                print("aborted")
                return
            shutil.rmtree(log_dir)
        else:
            print(f"Log dir {log_dir} exists; continuing (non-interactive). "
                  "Pass --resume to resume, or remove the directory to retrain "
                  "from scratch.")
    Trainer(cfgs).run()


if __name__ == "__main__":
    main()
