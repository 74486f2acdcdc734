"""Batched gather helpers (channels-last).

TPU-native analog of the reference's ``batch_indexing_channel_first/last``
(reference: models/utils.py:101-137). Everything here is channels-last:
data ``[B, N, C]`` (or ``[B, N]``), indices ``[B, I1, ..., Im]``.

Perf notes (measured, PERF.md round 2):

* TPU gathers are ROW-RATE-bound (~7-9 ns/row regardless of row width), so
  the only lever is fewer rows — see :func:`batch_gather_xyz_feat`.
* All indices in this codebase come from knn / fps / arange and are in
  bounds by construction, so gathers run in ``promise_in_bounds`` mode:
  the default clamping mode appended a full elementwise ``select`` pass
  over the gathered rows (~3 ms across the eval forward).
* XLA DUPLICATES a gather into every consumer fusion (observed: PointConv's
  merged gather materialized twice, once for the weight-net consumer and
  once for the einsum consumer — paying the row fetch twice). When the
  result has multiple consumers, pass ``shared=True`` to pin one
  materialization with ``optimization_barrier``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_gather_xyz_feat(
    xyz: jnp.ndarray, feat: jnp.ndarray, indices: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather coordinates and features with ONE fused row fetch.

    The 3D branch's dominant pattern — gather xyz AND features at the same
    neighbor indices — would pay the row rate twice for one logical fetch;
    concatenating [xyz | feat] into one table halves the row count for free.
    The result feeds two consumers (a weight-net on xyz, a contraction on
    feat), so the merged gather is pinned with ``shared=True``.

    Kept as two gathers when ``feat`` is lower-precision: point coordinates
    must not round-trip through bf16 (8-bit mantissa ~= centimeter-level
    quantization at scene scale).

    Returns ``(gathered_xyz float32 [B,...,3], gathered_feat [B,...,C])``.
    """
    if feat.dtype == jnp.float32:
        merged = batch_gather(
            jnp.concatenate([xyz.astype(jnp.float32), feat], axis=-1), indices,
            shared=True)
        return merged[..., :3], merged[..., 3:]
    return (batch_gather(xyz, indices).astype(jnp.float32),
            batch_gather(feat, indices))


def batch_gather(
    data: jnp.ndarray, indices: jnp.ndarray, shared: bool = False
) -> jnp.ndarray:
    """Gather along the point axis for every batch element.

    Args:
      data: ``[B, N, C]`` or ``[B, N]``.
      indices: integer array ``[B, I1, ..., Im]`` with values in ``[0, N)``
        (required — gathers run in promise_in_bounds mode).
      shared: set when the result has multiple consumer fusions, to stop XLA
        from duplicating the row fetch into each of them.

    Returns:
      ``[B, I1, ..., Im, C]`` (or ``[B, I1, ..., Im]`` for 2-D data).
    """
    assert data.shape[0] == indices.shape[0], "batch size mismatch"
    b = data.shape[0]
    idx_flat = indices.reshape(b, -1).astype(jnp.int32)  # [B, M]
    if data.ndim == 2:
        out = jnp.take_along_axis(data, idx_flat, axis=1,
                                  mode="promise_in_bounds")
        out = out.reshape(indices.shape)
    else:
        assert data.ndim == 3
        out = jnp.take_along_axis(data, idx_flat[..., None], axis=1,
                                  mode="promise_in_bounds")  # [B, M, C]
        out = out.reshape(indices.shape + (data.shape[-1],))
    if shared:
        out = jax.lax.optimization_barrier(out)
    return out
