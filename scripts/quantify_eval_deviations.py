#!/usr/bin/env python
"""Quantify the two TPU-eval deviations from the reference (VERDICT item 4).

(a) exact vs approx KNN: run the FULL flagship forward on TPU with both
    selection backends on the same weights+batch; report the EPE2D/EPE3D
    metric deltas and the raw flow-output divergence.
(b) fixed-``n_points`` eval resampling: the reference evaluates variable-size
    point clouds (reference flyingthings3d.py:89-93 subsamples only at
    train); the TPU pipeline resamples every eval item to a static 8192.
    Measure the metric spread across resample seeds on the same scene.

No trained checkpoint is available in this environment, so both experiments
run under fixed random-init weights (documented caveat in PERF.md); the
backend/resample *deltas* are still the quantity of interest, and the KNN
divergence is additionally reported on the raw flow fields.

    python scripts/quantify_eval_deviations.py [--h 288 --w 480 --n 8192]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def metric_means(outputs, batch):
    from rpeflow_tpu.train.evaluator import _metric_sums

    sums = jax.tree_util.tree_map(float, _metric_sums(outputs, batch, False))
    return {
        "EPE2d": sums["2d/EPE2d"] / sums["2d/counts"],
        "1px": sums["2d/1px"] / sums["2d/counts"],
        "Fl": sums["2d/Fl"] / sums["2d/counts"],
        "EPE3d": sums["3d/EPE3d"] / sums["3d/counts"],
        "5cm": sums["3d/5cm"] / sums["3d/counts"],
        "10cm": sums["3d/10cm"] / sums["3d/counts"],
    }


def fmt(m):
    return "  ".join(f"{k}={v:.6f}" for k, v in m.items())


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
    from rpeflow_tpu.ops.knn import set_knn_backend

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=args.b, h=args.h, w=args.w, n=args.n, bins=10,
                         with_targets=True)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b))(batch)

    def make_forward():
        # a FRESH function object per backend: jax caches outer jaxprs by
        # function identity, so re-jitting the same function after
        # set_knn_backend() silently reuses the old backend's trace
        def forward(batch):
            outputs, _ = model.apply(variables, batch, train=False,
                                     compute_mi=False, compute_loss=False)
            return outputs
        return forward

    results = {}
    flows = {}
    for backend in ("approx", "exact"):
        set_knn_backend(backend)
        fn = jax.jit(make_forward())
        t = time.time()
        out = jax.tree_util.tree_map(np.asarray, fn(batch))
        print(f"[{backend}] compile+run {time.time() - t:.1f}s", flush=True)
        flows[backend] = out
        results[backend] = metric_means(out, batch)
        print(f"[{backend}] {fmt(results[backend])}", flush=True)

    d2 = np.linalg.norm(
        flows["approx"]["flow_2d"] - flows["exact"]["flow_2d"], axis=-1)
    d3 = np.linalg.norm(
        flows["approx"]["flow_3d"] - flows["exact"]["flow_3d"], axis=-1)
    print(f"[knn] flow_2d divergence: mean={d2.mean():.6g} max={d2.max():.6g}")
    print(f"[knn] flow_3d divergence: mean={d3.mean():.6g} max={d3.max():.6g}")
    for k in results["exact"]:
        delta = results["approx"][k] - results["exact"][k]
        rel = delta / max(abs(results["exact"][k]), 1e-12)
        print(f"[knn] delta {k}: {delta:+.6g} ({rel:+.3%})")

    # (b) resample-seed spread: same scene cloud of 2*n points, three
    # different fixed-n subsample draws (what the TPU eval pipeline does to
    # every variable-size reference eval cloud).
    set_knn_backend("auto")
    fn = jax.jit(make_forward())
    big = _synth_batch(np.random.RandomState(1), b=args.b, h=args.h, w=args.w,
                       n=2 * args.n, bins=10, with_targets=True)
    per_seed = []
    for seed in range(3):
        rs = np.random.RandomState(100 + seed)
        sub = batch.copy()
        idx = np.stack([rs.choice(2 * args.n, args.n, replace=False)
                        for _ in range(args.b)])
        sub["pcs"] = np.take_along_axis(big["pcs"], idx[..., None], axis=1)
        sub["flow_3d"] = np.take_along_axis(big["flow_3d"], idx[..., None], axis=1)
        sub["images"] = big["images"]
        sub["event_voxel"] = big["event_voxel"]
        sub["intrinsics"] = big["intrinsics"]
        sub["flow_2d"] = big["flow_2d"]
        m = metric_means(jax.tree_util.tree_map(np.asarray, fn(sub)), sub)
        per_seed.append(m)
        print(f"[resample seed {seed}] {fmt(m)}", flush=True)
    for k in per_seed[0]:
        vals = np.array([m[k] for m in per_seed])
        print(f"[resample] {k}: mean={vals.mean():.6f} "
              f"spread(max-min)={vals.max() - vals.min():.6g}")


if __name__ == "__main__":
    main()
