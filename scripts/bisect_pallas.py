"""Per-kernel bisect of a non-finite flagship forward (VERDICT r2 item 1).

Runs the flagship eval-shape forward (batch 4, 576x960, 8192 pts — the
exact bench.py workload) in FRESH SUBPROCESSES, one per Pallas kill-switch
configuration, and reports which kernel class poisons the output. Fresh
processes are required because the switches are read at trace time
(rpeflow_tpu/ops/pallas/__init__.py docstring).

Default ladder:
  all-on             -> reproduce
  all-off            -> control
  leave-one-out x4   -> if exactly one "off" run is finite, that kernel
                        is guilty; confirm with only-that-kernel-on.

If NO leave-one-out run is finite (the round-2 outcome: >=2 kernels are
independently guilty), run the leave-one-ON ladder instead: enable exactly
one kernel per subprocess; every only-X run that goes non-finite is a
guilty kernel on its own.

Usage:
  python scripts/bisect_pallas.py                 # leave-one-out ladder
  python scripts/bisect_pallas.py --phase only    # leave-one-ON ladder
  python scripts/bisect_pallas.py --run-one       # child mode (internal)

Mirrors the role of the reference's standalone kernel test binaries
(reference: models/csrc/correlation/correlation_test.cpp:44-92) at the
whole-graph level: kernels are exonerated *in context*, where tile
alignment and layout interactions live, not just in isolation.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

KERNELS = ("corr", "fps", "mdta", "gdfn")


def run_one() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    # shape overrides for follow-up bisects (batch-dependence checks etc.)
    b = int(os.environ.get("RPEFLOW_BISECT_B", 4))
    h = int(os.environ.get("RPEFLOW_BISECT_H", 576))
    w = int(os.environ.get("RPEFLOW_BISECT_W", 960))
    n = int(os.environ.get("RPEFLOW_BISECT_N", 8192))
    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10)

    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)

    @jax.jit
    def forward(v, bt):
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        return outputs["flow_2d"], outputs["flow_3d"]

    t0 = time.perf_counter()
    f2d, f3d = forward(variables, jax.device_put(batch))
    f2d = np.asarray(jax.device_get(f2d))
    f3d = np.asarray(jax.device_get(f3d))
    dt = time.perf_counter() - t0
    bad2d = int(np.size(f2d) - np.sum(np.isfinite(f2d)))
    bad3d = int(np.size(f3d) - np.sum(np.isfinite(f3d)))
    print(json.dumps({
        "finite": bad2d == 0 and bad3d == 0,
        "nonfinite_2d": bad2d, "nonfinite_3d": bad3d,
        "total_2d": int(np.size(f2d)), "total_3d": int(np.size(f3d)),
        "abs_max_2d": float(np.nanmax(np.abs(f2d))),
        "compile_plus_first_s": round(dt, 1),
    }))


def spawn(label: str, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    # lift the round-3 mdta/gdfn quarantine so "all-on"/"off-X"/"only-X"
    # mean what they meant in round 2; explicit NO_* switches still win
    # (ops/pallas/__init__.py precedence)
    env["RPEFLOW_PALLAS_ALL"] = "1"
    env.update(env_extra)
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-one"],
        env=env, capture_output=True, text=True, timeout=2400)
    dt = time.perf_counter() - t0
    result: dict = {"label": label, "env": env_extra, "wall_s": round(dt, 1)}
    line = ""
    for ln in (p.stdout or "").strip().splitlines()[::-1]:
        if ln.startswith("{"):
            line = ln
            break
    if p.returncode == 0 and line:
        result.update(json.loads(line))
    else:
        result["error"] = (p.stderr or "")[-2000:]
        result["rc"] = p.returncode
    print(json.dumps(result), flush=True)
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", action="store_true")
    ap.add_argument("--skip-control", action="store_true",
                    help="skip the all-off control run")
    ap.add_argument("--phase", choices=("out", "only"), default="out",
                    help="'out' = leave-one-out; 'only' = exactly one "
                         "kernel enabled per run (use when no single "
                         "leave-one-out run is finite)")
    args = ap.parse_args()
    if args.run_one:
        run_one()
        return

    if args.phase == "only":
        guilty = []
        for k in KERNELS:
            env = {f"RPEFLOW_NO_PALLAS_{j.upper()}": "1"
                   for j in KERNELS if j != k}
            r = spawn(f"only-{k}", env)
            if not r.get("finite"):
                guilty.append(k)
        print(f"\nleave-one-on verdict: guilty on their own: "
              f"{guilty or 'none (interaction-only failure)'}", flush=True)
        return

    results = [spawn("all-on", {})]
    if not args.skip_control:
        results.append(spawn("all-off", {"RPEFLOW_NO_PALLAS": "1"}))
    if results[0].get("finite"):
        print("all-on is FINITE — nothing to bisect.", flush=True)
        return
    for k in KERNELS:
        results.append(spawn(f"off-{k}", {f"RPEFLOW_NO_PALLAS_{k.upper()}": "1"}))

    fixed = [r["label"][4:] for r in results
             if r["label"].startswith("off-") and r.get("finite")]
    print(f"\nleave-one-out verdict: disabling {fixed or 'none'} restores "
          f"finiteness", flush=True)
    if len(fixed) == 1:
        guilty = fixed[0]
        env = {f"RPEFLOW_NO_PALLAS_{k.upper()}": "1"
               for k in KERNELS if k != guilty}
        conf = spawn(f"only-{guilty}", env)
        print(f"confirmation (only-{guilty} on): "
              f"{'NON-FINITE -> confirmed guilty' if not conf.get('finite') else 'finite -> interaction effect, not a lone culprit'}",
              flush=True)


if __name__ == "__main__":
    main()
