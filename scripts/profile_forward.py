#!/usr/bin/env python
"""Capture a TPU trace of the flagship forward and attribute hot ops to model
source locations.

Combines jax.profiler capture, chrome-trace aggregation and optimized-HLO
metadata lookup (the tensorboard profile plugin's converters are broken in
this image, so the chrome trace is parsed directly).

    python scripts/profile_forward.py [--train | --segmented]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402


def capture(train: bool, segmented: bool = False):
    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    rng = np.random.RandomState(0)
    model = RPEFlow(cfgs=_model_cfg())
    batch = jax.device_put(
        _synth_batch(rng, b=4, h=576, w=960, n=8192, bins=10, with_targets=train))

    if train:
        from rpeflow_tpu.train.config import ConfigNode
        from rpeflow_tpu.train.optim import optimizer_factory
        from rpeflow_tpu.train.state import create_train_state, make_train_step

        variables = jax.jit(lambda bt: model.init(
            {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)}, bt,
            train=True, compute_mi=True, compute_loss=True))(batch)
        tcfg = ConfigNode({
            "max_epochs": 10, "optimizer": "adam",
            "lr": {"scheduler": "MultiStepLR", "init_value": 4e-4,
                   "decay_rate": 0.5, "decay_milestones": [4]},
            "weight_decay": 1e-6, "bias_decay": 0.0})
        tx, _ = optimizer_factory(tcfg, variables["params"], 100)
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx))
        lowered = step.lower(state, batch, jax.random.PRNGKey(0))

        def run():
            nonlocal state
            state, _ = step(state, batch, jax.random.PRNGKey(0))
            return state.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    elif segmented:
        # per-level jit segments (model/segmented.py) — the healthy-kernel
        # path; no single lowered module, so source attribution is skipped
        # and only the trace category/op totals are reported
        from rpeflow_tpu.model.segmented import make_segmented_forward

        variables = jax.jit(
            lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt))(batch)
        fwd = make_segmented_forward(model)
        lowered = None

        def run():
            return fwd(variables, batch)["flow_2d"]
    else:
        variables = jax.jit(
            lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt))(batch)
        fwd = jax.jit(lambda v, bt: model.apply(
            v, bt, train=False, compute_mi=False, compute_loss=False)[0])
        lowered = fwd.lower(variables, batch)

        def run():
            return fwd(variables, batch)["flow_2d"]

    np.asarray(run().ravel()[0])  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="rpeflow_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = run()
    np.asarray(out.ravel()[0])
    jax.profiler.stop_trace()
    return trace_dir, lowered


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true",
                        help="profile the train step instead of eval forward")
    parser.add_argument("--segmented", action="store_true",
                        help="profile the segmented (per-level jit) forward")
    parser.add_argument("--top", type=int, default=40)
    args = parser.parse_args()

    trace_dir, lowered = capture(args.train, args.segmented)
    hlo = lowered.compile().as_text() if lowered is not None else ""

    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace written under {trace_dir}"
    with gzip.open(traces[0], "rt") as f:
        events = json.load(f)["traceEvents"]

    durs = collections.defaultdict(float)
    cats = collections.defaultdict(float)
    op_re = re.compile(
        r"^(fusion|while|concatenate|copy|convolution|dynamic|custom|reduce|"
        r"transpose|scatter|gather|select|slice|pad|sort|bitcast|broadcast|"
        r"iota|multiply|add|subtract|compare|tuple|dot)")
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if op_re.match(name):
                durs[name] += e["dur"]
                cats[name.split(".")[0].split("(")[0]] += e["dur"]

    hlo_defs = {}
    def_re = re.compile(r"%(\S+) = ")
    for line in hlo.splitlines():
        m = def_re.search(line)
        if m:
            hlo_defs.setdefault(m.group(1), line)
    meta_re = re.compile(r'op_name="([^"]*)"')

    print("== category totals (ms per exec, 3 execs) ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v / 3 / 1000:8.2f}  {k}")

    print(f"\n== top {args.top} ops ==")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:args.top]:
        line = hlo_defs.get(name, "")
        m = meta_re.search(line)
        op = (m.group(1) if m else "?").replace("jit(<lambda>)/RPEFlow/", "") \
            .replace("jit(train_step)/", "")
        print(f"{d / 3 / 1000:7.2f} ms  {name[:28]:<28s} {op[:100]}")

    # full dump: every op with its source attribution + hlo shape line,
    # for offline aggregation
    with open("/tmp/profile_full.txt", "w") as f:
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1]):
            line = hlo_defs.get(name, "")
            m = meta_re.search(line)
            op = (m.group(1) if m else "?")
            shape = line.strip().split(" = ")[-1][:160] if line else ""
            f.write(f"{d / 3 / 1000:9.3f}\t{name}\t{op}\t{shape}\n")
    print("\nfull op dump: /tmp/profile_full.txt")


if __name__ == "__main__":
    main()
