"""Batched gather helpers (channels-last).

TPU-native analog of the reference's ``batch_indexing_channel_first/last``
(reference: models/utils.py:101-137). Everything here is channels-last:
data ``[B, N, C]`` (or ``[B, N]``), indices ``[B, I1, ..., Im]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_gather_xyz_feat(
    xyz: jnp.ndarray, feat: jnp.ndarray, indices: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather coordinates and features with ONE fused row fetch.

    TPU gathers are row-rate-bound, not bandwidth-bound: a [B,N,k] gather of
    3-channel xyz rows costs the same ~7-9 ns/row as a 131-channel feature
    gather (measured, PERF.md round 2). The 3D branch's dominant pattern —
    gather xyz AND features at the same neighbor indices — therefore pays
    twice for one logical fetch. Concatenating [xyz | feat] into one table
    halves the row count for free.

    Kept as two gathers when ``feat`` is lower-precision: point coordinates
    must not round-trip through bf16 (8-bit mantissa ~= centimeter-level
    quantization at scene scale).

    Returns ``(gathered_xyz float32 [B,...,3], gathered_feat [B,...,C])``.
    """
    if feat.dtype == jnp.float32:
        merged = batch_gather(
            jnp.concatenate([xyz.astype(jnp.float32), feat], axis=-1), indices)
        return merged[..., :3], merged[..., 3:]
    return (batch_gather(xyz, indices).astype(jnp.float32),
            batch_gather(feat, indices))


def batch_gather(data: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather along the point axis for every batch element.

    Args:
      data: ``[B, N, C]`` or ``[B, N]``.
      indices: integer array ``[B, I1, ..., Im]`` with values in ``[0, N)``.

    Returns:
      ``[B, I1, ..., Im, C]`` (or ``[B, I1, ..., Im]`` for 2-D data).
    """
    assert data.shape[0] == indices.shape[0], "batch size mismatch"
    b = data.shape[0]
    idx_flat = indices.reshape(b, -1).astype(jnp.int32)  # [B, M]
    if data.ndim == 2:
        out = jnp.take_along_axis(data, idx_flat, axis=1)
        return out.reshape(indices.shape)
    assert data.ndim == 3
    out = jnp.take_along_axis(data, idx_flat[..., None], axis=1)  # [B, M, C]
    return out.reshape(indices.shape + (data.shape[-1],))
