#!/usr/bin/env python
"""Quantify the metric impact of RPEFLOW_DW_BF16 (bf16 reads in the flat
depthwise tap passes, f32 accumulate — nn/mdta.py:_dw_flat).

Runs the FULL flagship forward twice on the same random-init weights and
batch — once with the f32 default, once with the flag — and reports the
2D/3D metric deltas plus the raw flow divergence. Same protocol and
caveat as scripts/quantify_eval_deviations.py: no trained checkpoint
exists in this environment, so deltas under random-init weights are the
quantity of interest. The expected class is bf16 rounding of activations,
i.e. the same class as the reference's grouped depthwise conv on the
bf16 MXU (PERF.md "Correctness-affecting perf facts").

    python scripts/quantify_dwbf16_deviation.py [--h 288 --w 480 --n 8192]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from quantify_eval_deviations import fmt, metric_means  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=int, default=288)
    parser.add_argument("--w", type=int, default=480)
    parser.add_argument("--n", type=int, default=8192)
    parser.add_argument("--b", type=int, default=2)
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=args.b, h=args.h, w=args.w, n=args.n, bins=10,
                         with_targets=True)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b))(batch)

    def make_forward():
        # fresh function object per config: the env flag is read at TRACE
        # time, and jax caches outer jaxprs by function identity
        def forward(batch):
            outputs, _ = model.apply(variables, batch, train=False,
                                     compute_mi=False, compute_loss=False)
            return outputs
        return forward

    results, flows = {}, {}
    for label, flag in (("f32", "0"), ("dw-bf16", "1")):
        os.environ["RPEFLOW_DW_BF16"] = flag
        fn = jax.jit(make_forward())
        t = time.time()
        out = jax.tree_util.tree_map(np.asarray, fn(batch))
        print(f"[{label}] compile+run {time.time() - t:.1f}s", flush=True)
        assert np.isfinite(out["flow_2d"]).all(), label
        assert np.isfinite(out["flow_3d"]).all(), label
        flows[label] = out
        results[label] = metric_means(out, batch)
        print(f"[{label}] {fmt(results[label])}", flush=True)

    d2 = np.linalg.norm(
        flows["dw-bf16"]["flow_2d"] - flows["f32"]["flow_2d"], axis=-1)
    d3 = np.linalg.norm(
        flows["dw-bf16"]["flow_3d"] - flows["f32"]["flow_3d"], axis=-1)
    print(f"[dw-bf16] flow_2d divergence: mean={d2.mean():.6g} max={d2.max():.6g}")
    print(f"[dw-bf16] flow_3d divergence: mean={d3.mean():.6g} max={d3.max():.6g}")
    for k in results["f32"]:
        delta = results["dw-bf16"][k] - results["f32"][k]
        rel = delta / max(abs(results["f32"][k]), 1e-12)
        print(f"[dw-bf16] delta {k}: {delta:+.6g} ({rel:+.3%})")


if __name__ == "__main__":
    main()
