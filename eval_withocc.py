#!/usr/bin/env python
"""Occlusion-aware evaluation entry point (reference eval_withocc.py:138-162).

    python eval_withocc.py --config conf/test/things.yaml --weights best.pt
"""

import argparse

from rpeflow_tpu.train.config import load_config
from rpeflow_tpu.train.evaluator import Evaluator
from rpeflow_tpu.train.trainer import init_logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True, help="Path to weights")
    parser.add_argument("--config", default="conf/test/things.yaml")
    args = parser.parse_args()

    cfgs = load_config(args.config)
    cfgs.ckpt.path = args.weights
    init_logging()
    Evaluator(cfgs, with_occ=True).run()


if __name__ == "__main__":
    main()
