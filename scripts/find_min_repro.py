"""Search for the smallest flagship-forward configuration that reproduces
the all-on NaN (round 3).

Grid: decode depth (n_levels), enabled Pallas kernel set, batch, resolution.
Each configuration runs in a fresh subprocess (kill switches are trace-time)
and reports finiteness + compile time. A small reproducer makes per-flag /
per-pass compiler bisects affordable (full graph: ~10 min/compile).

Usage:
  python scripts/find_min_repro.py            # walk the grid
  python scripts/find_min_repro.py --run-one  # child (env-configured)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def run_one():
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    b = int(os.environ.get("REPRO_B", 2))
    h = int(os.environ.get("REPRO_H", 576))
    w = int(os.environ.get("REPRO_W", 960))
    n = int(os.environ.get("REPRO_N", 8192))
    nl = int(os.environ.get("REPRO_NL", 6))
    samples = [n // (2 ** i) for i in range(1, nl)]
    model = RPEFlow(cfgs=_model_cfg(), n_samples_list=tuple(samples))
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10)
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt))(batch)

    @jax.jit
    def fwd(v, bt):
        out, _ = model.apply(v, bt, train=False, compute_mi=False,
                             compute_loss=False)
        return out["flow_2d"], out["flow_3d"]

    t0 = time.perf_counter()
    f2d, f3d = fwd(variables, jax.device_put(batch))
    f2d = np.asarray(jax.device_get(f2d))
    f3d = np.asarray(jax.device_get(f3d))
    print(json.dumps({
        "finite": bool(np.isfinite(f2d).all() and np.isfinite(f3d).all()),
        "nan2d_pct": round(100 * float(np.mean(~np.isfinite(f2d))), 1),
        "nan3d_pct": round(100 * float(np.mean(~np.isfinite(f3d))), 1),
        "compile_plus_first_s": round(time.perf_counter() - t0, 1),
    }))


KERNEL_SETS = {
    "only-corr": {"RPEFLOW_NO_PALLAS_FPS": "1", "RPEFLOW_NO_PALLAS_MDTA": "1",
                  "RPEFLOW_NO_PALLAS_GDFN": "1"},
    "only-mdta": {"RPEFLOW_NO_PALLAS_FPS": "1", "RPEFLOW_NO_PALLAS_CORR": "1",
                  "RPEFLOW_NO_PALLAS_GDFN": "1"},
    "all-on": {},
    "all-off": {"RPEFLOW_NO_PALLAS": "1"},
}


def spawn(label, env_extra, timeout=2400):
    env = dict(os.environ)
    env["RPEFLOW_PALLAS_ALL"] = "1"  # lift the mdta/gdfn quarantine (NO_* wins)
    env.update(env_extra)
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, os.path.abspath(__file__), "--run-one"],
                       env=env, capture_output=True, text=True, timeout=timeout)
    res = {"label": label, "wall_s": round(time.perf_counter() - t0, 1)}
    line = next((ln for ln in (p.stdout or "").strip().splitlines()[::-1]
                 if ln.startswith("{")), None)
    if p.returncode == 0 and line:
        res.update(json.loads(line))
    else:
        res["rc"] = p.returncode
        res["err"] = (p.stderr or "")[-1500:]
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", action="store_true")
    ap.add_argument("--grid", default="")
    args = ap.parse_args()
    if args.run_one:
        run_one()
        return

    # smallest-first: cheap compiles first, stop criteria are manual
    grid = [
        ("nl3-allon", {"REPRO_NL": "3"}, "all-on"),
        ("nl3-onlycorr", {"REPRO_NL": "3"}, "only-corr"),
        ("nl4-allon", {"REPRO_NL": "4"}, "all-on"),
        ("nl2-allon", {"REPRO_NL": "2"}, "all-on"),
        ("nl4-onlycorr", {"REPRO_NL": "4"}, "only-corr"),
        ("nl5-allon", {"REPRO_NL": "5"}, "all-on"),
    ]
    if args.grid:
        wanted = set(args.grid.split(","))
        grid = [g for g in grid if g[0] in wanted]
    for label, shape_env, kset in grid:
        env = dict(shape_env)
        env.update(KERNEL_SETS[kset])
        spawn(label, env)


if __name__ == "__main__":
    main()
