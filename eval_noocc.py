#!/usr/bin/env python
"""Evaluation without occlusion split (reference eval_noocc.py; used for DSEC
where occlusion ground truth is absent).

    python eval_noocc.py --config conf/test/dsec.yaml --weights best.pt
"""

import argparse

from rpeflow_tpu.train.config import load_config
from rpeflow_tpu.train.evaluator import Evaluator
from rpeflow_tpu.train.trainer import init_logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True, help="Path to weights")
    parser.add_argument("--config", default="conf/test/dsec.yaml")
    args = parser.parse_args()

    cfgs = load_config(args.config)
    cfgs.ckpt.path = args.weights
    init_logging()
    Evaluator(cfgs, with_occ=False).run()


if __name__ == "__main__":
    main()
