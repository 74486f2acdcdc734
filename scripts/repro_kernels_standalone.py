"""Standalone TPU repro of each Pallas kernel at its exact in-context shapes.

The round-3 bisect (scripts/bisect_pallas.py, /tmp/bisect_only.log) showed
THREE kernels (corr, mdta, gdfn) independently produce a non-finite flagship
forward on the current toolchain while the CPU-interpreter parity tests all
pass. This script answers the discriminating question: do the kernels fail
STANDALONE on the real chip at the exact shapes the flagship model calls
them with, or only in graph context (which would indicate an XLA-level
miscompile around the custom-call boundary rather than kernel bugs)?

Phase 1: jax.eval_shape-trace the flagship eval forward with recorders
monkeypatched over the three kernel entry points — collects every
(kernel, shapes) signature actually dispatched, with zero compute.
Phase 2: for each signature, run the Pallas kernel and its XLA oracle
standalone on the TPU with random inputs; report finiteness + max-abs-diff.

Usage:  python scripts/repro_kernels_standalone.py [--scale 1.0] [--b 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="input std multiplier (decode activations run hot)")
    ap.add_argument("--dirty-hbm-gb", type=float, default=0.0,
                    help="before each kernel run, fill this many GB of HBM "
                         "with NaNs and free it, so freshly-allocated input "
                         "buffers sit on recycled NaN-stamped pages. Physical "
                         "tile-padding lanes (e.g. the 47 garbage lanes of a "
                         "C=81 row tile) are NOT written by the input "
                         "transfer — a kernel that reads padding lanes and "
                         "relies on 0*garbage==0 only fails on dirty memory, "
                         "which is exactly the in-context (clean standalone) "
                         "signature of the round-3 all-on NaN.")
    ap.add_argument("--canary-gb", type=float, default=0.0,
                    help="blanket this many GB of HBM with sentinel-filled "
                         "64 MB buffers, free every other one (so kernel "
                         "inputs/outputs allocate into the holes BETWEEN "
                         "live canaries), and re-verify the survivors after "
                         "every kernel run. Detects the OTHER corruption "
                         "class the in-context NaN could be: a kernel "
                         "WRITING outside its output buffer and clobbering "
                         "an unrelated live buffer (which would explain NaN "
                         "appearing in modules that never touch the kernel, "
                         "barrier immunity, and batch>=2-only failures).")
    args = ap.parse_args()

    # lift the round-3 mdta/gdfn quarantine for the signature-capture trace:
    # without this the dispatch sites never call the quarantined kernels and
    # this script silently tests nothing for them (must be set before the
    # rpeflow imports below — switches are read at trace time)
    os.environ.setdefault("RPEFLOW_PALLAS_ALL", "1")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from rpeflow_tpu.ops.pallas import correlation as corr_mod
    from rpeflow_tpu.ops.pallas import gdfn as gdfn_mod
    from rpeflow_tpu.ops.pallas import mdta as mdta_mod

    # ---- phase 1: signature capture via abstract trace -------------------
    sigs = {"corr": set(), "mdta": set(), "gdfn": set()}

    orig_corr = corr_mod.correlation2d_pallas
    orig_mdta = mdta_mod.mdta_qkv_pallas
    orig_gdfn = gdfn_mod.gdfn_pallas

    def rec_corr(f1, f2, d):
        sigs["corr"].add((tuple(f1.shape), d))
        return orig_corr(f1, f2, d)

    def rec_mdta(x, y, ln, dw, kh=3):
        sigs["mdta"].add((tuple(x.shape), kh))
        return orig_mdta(x, y, ln, dw, kh=kh)

    def rec_gdfn(x, w_in, w_dw, w_out):
        sigs["gdfn"].add((tuple(x.shape), w_in.shape[1] // 2))
        return orig_gdfn(x, w_in, w_dw, w_out)

    corr_mod.correlation2d_pallas = rec_corr
    mdta_mod.mdta_qkv_pallas = rec_mdta
    gdfn_mod.gdfn_pallas = rec_gdfn

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=args.b, h=args.h, w=args.w, n=args.n, bins=10)
    variables = jax.eval_shape(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt), batch)

    def fwd(v, bt):
        out, _ = model.apply(v, bt, train=False, compute_mi=False,
                             compute_loss=False)
        return out["flow_2d"]

    jax.eval_shape(fwd, variables, batch)
    corr_mod.correlation2d_pallas = orig_corr
    mdta_mod.mdta_qkv_pallas = orig_mdta
    gdfn_mod.gdfn_pallas = orig_gdfn

    for k in ("corr", "mdta", "gdfn"):
        print(f"{k}: {len(sigs[k])} signatures")
        for s in sorted(sigs[k]):
            print(f"  {s}")
    sys.stdout.flush()

    # ---- phase 2: standalone runs vs oracles ------------------------------
    key = jax.random.PRNGKey(42)
    scale = args.scale
    failures = []

    def dirty_hbm():
        if not args.dirty_hbm_gb:
            return
        # 64 MB chunks: a single flat fill hits the 2^31-element indexing
        # boundary at 8 GB (observed hang) and one huge allocation can
        # RESOURCE_EXHAUST the next kernel while its deferred free retires
        # (observed with a 7 GB buffer through the tunnel runtime).
        buf_words = (64 << 20) // 4
        n_buf = int(args.dirty_hbm_gb * (1 << 30) / (64 << 20))
        poison = [jnp.full((buf_words,), jnp.nan, jnp.float32)
                  for _ in range(n_buf)]
        jax.block_until_ready(poison)
        del poison
        # force the frees to retire before the kernel's buffers allocate
        jax.block_until_ready(jnp.zeros((8,), jnp.float32))

    SENTINEL = jnp.float32(1.2345e6)
    canaries = []
    check_fn = jax.jit(lambda buf: jnp.sum(buf != SENTINEL))

    def plant_canaries():
        if not args.canary_gb or canaries:
            return
        buf_words = (64 << 20) // 4  # 64 MB buffers
        n_buf = max(2, int(args.canary_gb * (1 << 30) / (64 << 20)))
        grid = [jnp.full((buf_words,), SENTINEL, jnp.float32)
                for _ in range(n_buf)]
        jax.block_until_ready(grid)
        # free every other buffer: kernel I/O lands in the holes, each
        # bracketed by live sentinel pages above and below
        canaries.extend(grid[1::2])
        del grid

    def check_canaries(kind, sig):
        bad = 0
        for i, buf in enumerate(canaries):
            n_bad = int(check_fn(buf))
            if n_bad:
                bad += n_bad
                print(f"CANARY CLOBBERED after {kind} {sig}: buffer {i}, "
                      f"{n_bad} words differ", flush=True)
        if bad:
            failures.append((kind, sig, "canary"))
        return bad

    def report(kind, sig, pal, ref):
        pal, ref = np.asarray(pal), np.asarray(ref)
        finite = bool(np.isfinite(pal).all())
        diff = float(np.max(np.abs(pal - ref))) if finite else float("nan")
        ok = finite and diff < 1e-2 * max(1.0, float(np.max(np.abs(ref))))
        status = "ok" if ok else "FAIL"
        if not ok:
            failures.append((kind, sig))
        nanpct = 100 * float(np.mean(~np.isfinite(pal)))
        print(f"{status:4s} {kind} {sig}  finite={finite} nan%={nanpct:.1f} "
              f"maxdiff={diff:.3e}", flush=True)

    from rpeflow_tpu.nn.mdta import _attn_ref_flat, _gdfn_ref
    from rpeflow_tpu.ops.correlation import correlation2d_ref

    plant_canaries()

    for (shape, d) in sorted(sigs["corr"]):
        dirty_hbm()
        key, k1, k2 = jax.random.split(key, 3)
        f1 = jax.random.normal(k1, shape, jnp.float32) * scale
        f2 = jax.random.normal(k2, shape, jnp.float32) * scale
        pal = jax.jit(lambda a, b: orig_corr(a, b, d))(f1, f2)
        ref = jax.jit(lambda a, b: correlation2d_ref(a, b, d))(f1, f2)
        report("corr", (shape, d), pal, ref)
        check_canaries("corr", (shape, d))

    for (shape, kh) in sorted(sigs["mdta"]):
        dirty_hbm()
        b, h, w, c = shape
        heads = 1  # heads only affect the post-kernel math; kernel is per-C
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        x = jax.random.normal(k1, shape, jnp.float32) * scale
        y = jax.random.normal(k2, shape, jnp.float32) * scale
        ln = jnp.stack([jnp.ones((c,)), jnp.zeros((c,)),
                        jnp.ones((c,)), jnp.zeros((c,))])
        dw = jax.random.normal(k3, (kh, 3, 3 * c), jnp.float32) * 0.2
        w_out = jax.random.normal(k4, (c, c), jnp.float32) * 0.1
        temp = jnp.ones((heads, 1, 1), jnp.float32)
        from rpeflow_tpu.nn.mdta import _mdta_attn_fused
        pal = jax.jit(lambda *a: _mdta_attn_fused(*a, kh, heads))(
            x, y, ln, dw, temp, w_out)
        ref = jax.jit(lambda *a: _attn_ref_flat(*a, kh=kh, num_heads=heads))(
            x, y, ln, dw, temp, w_out)
        report("mdta", (shape, kh), pal, ref)
        check_canaries("mdta", (shape, kh))

    for (shape, hidden) in sorted(sigs["gdfn"]):
        dirty_hbm()
        b, h, w, c = shape
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        x = jax.random.normal(k1, shape, jnp.float32) * scale
        w_in = jax.random.normal(k2, (c, 2 * hidden), jnp.float32) * 0.1
        w_dw = jax.random.normal(k3, (3, 3, 2 * hidden), jnp.float32) * 0.2
        w_out = jax.random.normal(k4, (hidden, c), jnp.float32) * 0.1
        pal = jax.jit(orig_gdfn)(x, w_in, w_dw, w_out)
        ref = jax.jit(_gdfn_ref)(x, w_in, w_dw, w_out)
        report("gdfn", (shape, hidden), pal, ref)
        check_canaries("gdfn", (shape, hidden))

    print(f"\nverdict: {len(failures)} standalone failures"
          + (f": {failures}" if failures else
         " — kernels are clean standalone; suspect graph-context miscompile"))


if __name__ == "__main__":
    main()
