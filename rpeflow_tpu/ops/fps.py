"""Furthest point sampling.

TPU-native equivalent of the reference CUDA op (reference:
models/csrc/furthest_point_sampling/furthest_point_sampling_kernel.cu:34-85,
torch fallback models/csrc/wrapper.py:83-96).

FPS is inherently sequential (each selection depends on the running
min-distance field). Two implementations:

  * ``lax.scan`` formulation (this file) — portable, bit-exact vs the torch
    fallback, but pays XLA while-loop overhead per step (~18us/step on v5e).
  * Pallas kernel (pallas/fps.py) — the full selection loop runs inside one
    TPU program with all operands in VMEM (~33x faster). Selected on TPU by
    default; indices can diverge from the scan path on exact distance ties
    (~0.02% of selections), which downstream consumers are insensitive to.

Set RPEFLOW_FPS_IMPL=xla|pallas|auto to override.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sampling(xyz: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, lax.scan elsewhere."""
    from .pallas import pallas_enabled

    impl = os.environ.get("RPEFLOW_FPS_IMPL", "auto")
    use_pallas = impl == "pallas" or (
        impl == "auto" and pallas_enabled("fps")
        and jax.default_backend() == "tpu")
    if use_pallas:
        from .pallas.fps import furthest_point_sampling_pallas

        return furthest_point_sampling_pallas(xyz, n_samples)
    return furthest_point_sampling_scan(xyz, n_samples)


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sampling_scan(xyz: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Iteratively select ``n_samples`` mutually-far points.

    Matches the reference semantics exactly: selection starts at index 0,
    min-distance field initialized to 1e10, next index = argmax of the
    updated field (first index wins ties).

    Args:
      xyz: ``[B, N, 3]`` points.
      n_samples: number of points to select (static).

    Returns:
      ``[B, n_samples]`` int32 indices.
    """
    b, n, _ = xyz.shape
    # n == n_samples is legal (reference wrapper hard-codes 4096 samples,
    # models/RPEFlow.py:74, and eval clouds can be exactly that size): FPS
    # then returns all points in far-first order.
    assert n >= n_samples, "n_samples must not exceed the number of points"
    xyz = xyz.astype(jnp.float32)

    def body(carry, _):
        dists, current = carry  # [B, N], [B]
        sel = jnp.take_along_axis(xyz, current[:, None, None], axis=1)  # [B,1,3]
        new_d = jnp.sum((xyz - sel) ** 2, axis=-1)  # [B, N]
        dists = jnp.minimum(dists, new_d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)
        return (dists, nxt), current

    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b,), jnp.int32))
    _, selected = lax.scan(body, init, None, length=n_samples)
    return selected.T  # [B, n_samples]
