"""Microbenchmark: convex_upsample formulations on TPU.

The current formulation materializes 6-D [B,H,W,4,4,2] tensors whose (4,2)
trailing dims pad to (8,128) — a 64x physical blowup that shows up as ~10ms
of layout copies in the forward profile. Variants tested:

  A) current: einsum bhwnpq,bhwnc->bhwpqc + 6-D transpose
  B) elementwise repeat/tile accumulate to [B,H,W,32] + conv_transpose
     depth-to-space (one-hot kernel, MXU)
  C) elementwise accumulate to [B,H,W,32] + reshape/transpose depth-to-space
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rpeflow_tpu.ops.interp import convex_upsample

B, H, W, S = 4, 144, 240, 4


def _acc32(flow, mask):
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, S * S)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(flow * S, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, w, S * S * 2), flow.dtype)
    for n, (di, dj) in enumerate([(i, j) for i in range(3) for j in range(3)]):
        fn = fp[:, di:di + h, dj:dj + w, :]                    # [B,H,W,2]
        mn = m[:, :, :, n, :]                                  # [B,H,W,16]
        acc = acc + jnp.repeat(mn, 2, axis=-1) * jnp.tile(fn, (1, 1, 1, S * S))
    return acc  # channel layout (p, q, c)


def variant_b(flow, mask):
    b, h, w, _ = flow.shape
    acc = _acc32(flow, mask)
    k = np.zeros((S, S, S * S * 2, 2), np.float32)
    for p in range(S):
        for q in range(S):
            for c in range(2):
                k[S - 1 - p, S - 1 - q, (p * S + q) * 2 + c, c] = 1.0
    return jax.lax.conv_transpose(
        acc, jnp.asarray(k), strides=(S, S), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def variant_c(flow, mask):
    b, h, w, _ = flow.shape
    acc = _acc32(flow, mask)
    acc = acc.reshape(b, h, w, S, S, 2).transpose(0, 1, 3, 2, 4, 5)
    return acc.reshape(b, h * S, w * S, 2)


rng = np.random.RandomState(0)
flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32))
mask = jnp.asarray(rng.randn(B, H, W, 9 * S * S).astype(np.float32))

ref = np.asarray(convex_upsample(flow, mask, S))
for name, fn in [("B", variant_b), ("C", variant_c)]:
    out = np.asarray(jax.jit(fn)(flow, mask))
    err = np.abs(out - ref).max()
    print(f"variant {name}: max err {err:.2e}")
    assert err < 1e-4, name


def bench(fn, name):
    f = jax.jit(fn)
    o = f(flow, mask)
    np.asarray(o).ravel()[0]
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(flow, mask)
    np.asarray(o.ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.3f} ms")


bench(lambda f, m: convex_upsample(f, m, S), "A current")
bench(variant_b, "B conv_transpose d2s")
bench(variant_c, "C reshape/transpose d2s")
