"""Locate the first non-finite intermediate in the flagship eval forward.

Triage tool for XLA:TPU/Mosaic miscompile regressions (a server-side
toolchain update can turn a previously-validated-finite graph into NaN at
one shape only — it happened twice: PERF.md "bf16 decode-fuser experiment"
round 2, and the round-2 timing-integrity incident where the DEFAULT
f32+remat eval forward went 100% NaN after a runtime update).

Runs the full eval forward with flax ``capture_intermediates`` and prints
every module whose output contains a non-finite value, in module-path
order, plus input/param finiteness so the true origin (first producer of a
NaN from finite inputs) can be read off the report.

Memory note (advisor r2): capture_intermediates keeps EVERY module output
live in HBM simultaneously — at the full flagship shape (576x960, b=4) that
can OOM a 16 GB v5e. The default is therefore b=1; shape-dependent NaNs
usually reproduce there (the round-2 miscompiles keyed on H/W, not batch).
If the failure only appears at b=4, pass ``--b 4`` and reduce --h/--w until
it fits, or fall back to RPEFLOW_NO_PALLAS_* leave-one-out bisection
(scripts/bisect_pallas.py), which runs the plain forward.

Usage:
    python scripts/bisect_nan.py [--h 576] [--w 960] [--n 8192] [--b 1]
    RPEFLOW_NO_PALLAS=1 python scripts/bisect_nan.py   # triage Pallas vs XLA
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--n", type=int, default=8192)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=args.b, h=args.h, w=args.w, n=args.n, bins=10)
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)
    jax.block_until_ready(variables)
    bad_params = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        if not np.all(np.isfinite(np.asarray(leaf))):
            bad_params.append(jax.tree_util.keystr(path))
    print(f"params finite: {not bad_params}"
          + (f" BAD: {bad_params[:5]}" if bad_params else ""))

    @jax.jit
    def fwd(v, bt):
        (out, _aux), mut = model.apply(
            v, bt, train=False, compute_mi=False, compute_loss=False,
            capture_intermediates=True, mutable=["intermediates"])
        return out, mut["intermediates"]

    out, inter = fwd(variables, jax.device_put(batch))
    inter = jax.device_get(inter)
    f2 = np.asarray(jax.device_get(out["flow_2d"]))
    print(f"flow_2d finite: {np.isfinite(f2).all()} "
          f"nan%: {100 * np.mean(~np.isfinite(f2)):.1f}")

    n_bad = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        arr = np.asarray(leaf)
        if arr.dtype.kind != "f":
            continue
        frac = float(np.mean(~np.isfinite(arr)))
        if frac > 0:
            n_bad += 1
            print(f"NONFINITE {frac * 100:6.2f}%  {arr.shape}  "
                  f"{jax.tree_util.keystr(path)}")
    if n_bad == 0:
        print("all captured intermediates finite")


if __name__ == "__main__":
    main()
