"""Batched gather helpers (channels-last).

TPU-native analog of the reference's ``batch_indexing_channel_first/last``
(reference: models/utils.py:101-137). Everything here is channels-last:
data ``[B, N, C]`` (or ``[B, N]``), indices ``[B, I1, ..., Im]``.
"""

from __future__ import annotations

import jax.numpy as jnp


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
