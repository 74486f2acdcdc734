#!/usr/bin/env python
"""Per-component timing breakdown on the FlyingThings3D eval shape.

Times the suspected hot ops in isolation (FPS scan, the KNN family,
correlation2d both impls, event voxel-shape convs) plus the full forward,
to direct the Pallas/perf work. Run on TPU:

    python scripts/bench_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402


def _sync(out):
    """Force completion with a host readback (block_until_ready may be async
    under tunneled runtimes). Device launches are in-order, so reading back
    one leaf of the last output drains the whole queue."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def timeit(name, fn, iters=10):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    roundtrip = 0.0265  # measured tunnel readback latency (s)
    dt = (time.perf_counter() - t0 - roundtrip) / iters * 1000
    print(f"{name:<42s} {dt:8.2f} ms")
    return dt


def main():
    import jax.numpy as jnp

    from rpeflow_tpu.ops import correlation2d_ref, furthest_point_sampling, k_nearest_neighbor
    from rpeflow_tpu.ops.pallas.correlation import correlation2d_pallas

    rng = np.random.RandomState(0)
    B, N = 4, 8192
    H1, W1 = 144, 240  # level-1 (finest decode level) for 576x960 input

    pc = jnp.asarray(rng.rand(2 * B, N, 3).astype(np.float32))
    timeit("fps 8k->4k (2B=8 clouds)",
           lambda: furthest_point_sampling(pc, 4096))

    xyz1 = jnp.asarray(rng.rand(B, 4096, 3).astype(np.float32))
    timeit("knn 4096 self k=16",
           lambda: k_nearest_neighbor(xyz1, xyz1, 16))

    grid = jnp.asarray(rng.rand(B, H1 * W1, 2).astype(np.float32) * 200)
    xy = jnp.asarray(rng.rand(B, 4096, 2).astype(np.float32) * 200)
    timeit("knn proj grid(34560)->pts(4096) k=1",
           lambda: k_nearest_neighbor(xy, grid, 1))

    f1 = jnp.asarray(rng.randn(B, H1, W1, 64).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H1, W1, 64).astype(np.float32))
    timeit("correlation2d XLA (level1)", lambda: correlation2d_ref(f1, f2, 4))
    try:
        timeit("correlation2d Pallas (level1)",
               lambda: correlation2d_pallas(f1, f2, 4))
    except Exception as e:
        print("pallas corr failed:", e)

    # gather-heavy pointconv-like pattern
    from rpeflow_tpu.ops.gather import batch_gather

    idx = jnp.asarray(rng.randint(0, 8192, (B, 8192, 16)).astype(np.int32))
    feats = jnp.asarray(rng.randn(B, 8192, 67).astype(np.float32))
    w = jnp.asarray(rng.randn(B, 8192, 16, 16).astype(np.float32))

    @jax.jit
    def pointconv_core(feats, idx, w):
        g = batch_gather(feats, idx)  # [B, N, k, C]
        return jnp.einsum("bskw,bskc->bswc", w, g,
                          preferred_element_type=jnp.float32)

    timeit("pointconv gather+contract (8192,k16)",
           lambda: pointconv_core(feats, idx, w))

    # full model forward
    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    batch = _synth_batch(rng, b=B, h=576, w=960, n=N, bins=10)
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt))(batch)

    @jax.jit
    def fwd(v, bt):
        return model.apply(v, bt, train=False, compute_mi=False,
                           compute_loss=False)[0]

    batch = jax.device_put(batch)
    timeit("FULL forward (B=4, 576x960, 8192 pts)",
           lambda: fwd(variables, batch), iters=5)


if __name__ == "__main__":
    main()
