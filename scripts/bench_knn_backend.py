"""Quantify the approx-KNN eval deviation on the full flagship model (TPU).

TPU eval defaults to ``lax.approx_min_k`` with recall_target 0.95
(ops/knn.py); parity tests run exact on CPU. This script runs the SAME
fixed batch through the full eval forward with exact top-k and with
approx at several recall targets, and reports:

  * flow output deltas (mean/max |Δ| per output),
  * the EPE2D/EPE3D metric deltas against a fixed synthetic target
    (i.e. how much the *reported metric* moves),
  * per-config forward time.

Caveat (documented in PERF.md): weights are random-initialized — trained
weights could be more or less sensitive; this bounds the numerical effect
of the selection backend through the real 5-level decode at the real shape.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow
    from rpeflow_tpu.model.rpeflow import flow_metrics
    from rpeflow_tpu.ops import knn as knn_mod

    rng = np.random.RandomState(0)
    model = RPEFlow(cfgs=_model_cfg())
    batch = _synth_batch(rng, b=4, h=576, w=960, n=8192, bins=10,
                         with_targets=True)
    batch_dev = jax.device_put(batch)

    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0)}, b, train=False,
        compute_mi=False, compute_loss=False))(batch_dev)

    def fwd(bt):
        out, _ = model.apply(variables, bt, train=False, compute_mi=False,
                             compute_loss=False)
        return out

    results = {}
    for label, backend, recall in [
        ("exact", "exact", None),
        ("approx_r0.95", "approx", 0.95),
        ("approx_r0.99", "approx", 0.99),
    ]:
        knn_mod.set_knn_backend(backend, recall)
        f = jax.jit(fwd)
        t0 = time.time()
        out = f(batch_dev)
        out = {k: np.asarray(v) for k, v in out.items()}
        compile_time = time.time() - t0
        t0 = time.time()
        out2 = {k: np.asarray(v) for k, v in f(batch_dev).items()}
        run_time = time.time() - t0
        results[label] = out
        m = flow_metrics(
            jnp.asarray(out["flow_2d"]), jnp.asarray(out["flow_3d"]),
            jnp.asarray(batch["flow_2d"]), jnp.asarray(batch["flow_3d"]))
        print(f"{label}: compile+1st {compile_time:.1f}s, fwd {run_time*1e3:.0f} ms, "
              f"EPE2D {float(m['epe2d']):.6f}, EPE3D {float(m['epe3d']):.6f}",
              flush=True)

    ref = results["exact"]
    for label in ["approx_r0.95", "approx_r0.99"]:
        d2 = np.abs(results[label]["flow_2d"] - ref["flow_2d"])
        d3 = np.abs(results[label]["flow_3d"] - ref["flow_3d"])
        print(f"{label} vs exact: |dflow2d| mean {d2.mean():.2e} max {d2.max():.2e}; "
              f"|dflow3d| mean {d3.mean():.2e} max {d3.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
