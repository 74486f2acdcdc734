"""K-nearest-neighbor search with static shapes.

TPU-native equivalent of the reference CUDA op (reference:
models/csrc/k_nearest_neighbor/k_nearest_neighbor_kernel.cu:8-112 and the
pure-torch fallback at models/csrc/wrapper.py:106-127).

Design: brute-force pairwise squared distances expressed as a matmul
(``-2 q.xT + |q|^2 + |x|^2``) so the MXU does the heavy lifting, followed by
a k-smallest selection. The query axis is processed in chunks through
``lax.map`` so peak memory stays bounded for large Q*N products (e.g. the
34560-query pixel-grid -> point NN search in the decode loop).

Selection backend: ``lax.top_k`` lowers to a full bitonic sort on TPU
(~35 ms for 4x4096x4096/k=16 on v5e); ``lax.approx_min_k`` uses the TPU's
native partial-reduction PartialReduce op and is ~20x faster at ~99% recall.
The backend is process-global:

  * 'auto' (default): approx on TPU (recall_target 0.95), exact elsewhere
  * 'exact': always lax.top_k
  * 'approx': always approx_min_k

Override via env RPEFLOW_KNN_BACKEND or :func:`set_knn_backend`. Parity
tests run exact (CPU); the approx path only drops a far-tail neighbor
occasionally, which downstream distance-weighted aggregation suppresses.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# Soft cap on the size (in f32 elements) of the materialized distance matrix
# per chunk. 128M elements = 512 MB — large chunks keep the sequential
# lax.map short (loop overhead dominates small chunks; profiling showed the
# 34560-query NN search spending more time in while-loop plumbing than math).
_CHUNK_BUDGET_ELEMS = 128 * 1024 * 1024

_BACKEND = os.environ.get("RPEFLOW_KNN_BACKEND", "auto")
_RECALL_TARGET = float(os.environ.get("RPEFLOW_KNN_RECALL", "0.95"))


def set_knn_backend(backend: str, recall_target: float | None = None) -> None:
    """Select the k-smallest selection backend ('auto' | 'exact' | 'approx').

    Call BEFORE tracing/jitting any function that uses KNN: jax caches outer
    jaxprs by function identity, so a function traced under the old backend
    keeps it. To switch mid-process, re-jit a FRESH function object (a new
    lambda/closure) after calling this (see
    scripts/quantify_eval_deviations.py).
    """
    global _BACKEND, _RECALL_TARGET
    assert backend in ("auto", "exact", "approx")
    _BACKEND = backend
    if recall_target is not None:
        _RECALL_TARGET = recall_target


def _use_approx() -> bool:
    if _BACKEND == "exact":
        return False
    if _BACKEND == "approx":
        return True
    return jax.default_backend() == "tpu"


def squared_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance.

    Args:
      a: ``[..., M, D]``
      b: ``[..., N, D]``
    Returns:
      ``[..., M, N]`` squared distances in float32.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    cross = jnp.einsum("...md,...nd->...mn", a, b, preferred_element_type=jnp.float32)
    d = -2.0 * cross
    d = d + jnp.sum(a * a, axis=-1)[..., :, None]
    d = d + jnp.sum(b * b, axis=-1)[..., None, :]
    return d


def _pick_chunk(q: int, n: int, b: int, k: int) -> int:
    """Largest power-of-two query chunk that keeps B*chunk*N under budget.

    k == 1 gets a 10x budget: argmin fuses into the distance computation so
    the matrix is never fully resident, and the chunked lax.map was measured
    7x SLOWER than the single fused block at the decode pixel-grid shape
    (4x34560x4096: 21.3 ms chunked vs 3.0 ms fused, scripts/bench_knn1.py).
    10x covers the batch-stacked two-frame call at the finest decode level
    (2*4 x 34560 x 4096 = 1.13G elems).
    """
    budget = _CHUNK_BUDGET_ELEMS * (10 if k == 1 else 1)
    chunk = q
    while chunk > 128 and b * chunk * n > budget:
        chunk //= 2
    return max(chunk, 1)


def k_nearest_neighbor(
    input_xyz: jnp.ndarray,
    query_xyz: jnp.ndarray,
    k: int,
    chunk_size: int | None = None,
) -> jnp.ndarray:
    """For each query point, the indices of its k nearest input points.

    Args:
      input_xyz: ``[B, N, D]`` candidate points (D = 2 or 3).
      query_xyz: ``[B, Q, D]`` query points.
      k: number of neighbors (static).
      chunk_size: optional static query-chunk size override.

    Returns:
      ``[B, Q, k]`` int32 indices into the input point axis, sorted by
      ascending distance (ties broken by lower index, matching a stable
      top-k as in the reference's torch fallback).
    """
    # This wrapper stays un-jitted ON PURPOSE: the selection backend is a
    # process global, and baking it into a jitted function's trace cache
    # made set_knn_backend() a silent no-op under an outer jit (the cached
    # inner jaxpr kept the old backend — caught by
    # scripts/quantify_eval_deviations.py producing bit-identical
    # exact/approx flows). The global is resolved HERE, each outer trace,
    # and passed down as a static argument.
    return _knn_impl(input_xyz, query_xyz, k, chunk_size, _use_approx(),
                     _RECALL_TARGET)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _knn_impl(
    input_xyz: jnp.ndarray,
    query_xyz: jnp.ndarray,
    k: int,
    chunk_size: int | None,
    use_approx: bool,
    recall_target: float,
) -> jnp.ndarray:
    b, q, d = query_xyz.shape
    n = input_xyz.shape[1]
    assert input_xyz.shape[0] == b and input_xyz.shape[2] == d
    assert k <= n, (
        f"k={k} exceeds the candidate point count n={n}; shrink pwc3d.k or "
        f"use more points at the coarsest pyramid level")

    chunk = chunk_size or _pick_chunk(q, n, b, k)
    if chunk >= q:
        return _knn_block(input_xyz, query_xyz, k, use_approx, recall_target)

    pad = (-q) % chunk
    qpad = jnp.pad(query_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (q + pad) // chunk
    # [n_chunks, B, chunk, D]
    qchunks = qpad.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    out = lax.map(
        lambda qc: _knn_block(input_xyz, qc, k, use_approx, recall_target),
        qchunks)
    out = out.transpose(1, 0, 2, 3).reshape(b, q + pad, k)
    return out[:, :q]


def _knn_block(input_xyz: jnp.ndarray, query_xyz: jnp.ndarray, k: int,
               use_approx: bool, recall_target: float) -> jnp.ndarray:
    dist = squared_distance(query_xyz, input_xyz)  # [B, Qc, N]
    if k == 1:
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)[..., None]
    if use_approx:
        _, idx = lax.approx_min_k(dist, k, recall_target=recall_target)
    else:
        _, idx = lax.top_k(-dist, k)
    return idx.astype(jnp.int32)
