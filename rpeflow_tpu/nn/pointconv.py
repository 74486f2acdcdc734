"""PointConv layers (channels-last).

TPU-native equivalent of reference models/pointconv.py:7-122. The core
computation — gather k neighbors, learn continuous weights from relative
coordinates, and contract weights against neighbor features — is expressed as
an einsum so the contraction lands on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.gather import batch_gather
from ..ops.knn import k_nearest_neighbor
from .layers import MLP, apply_activation, instance_norm, torch_kernel_init


class PointConv(nn.Module):
    """Weight-net point convolution, optionally downsampling.

    Call with ``sampled_xyz=None`` (and optional precomputed ``knn_indices``)
    for the no-sampling variant (reference models/pointconv.py:64-122), or
    with a coarser ``sampled_xyz`` for the downsampling variant
    (models/pointconv.py:7-61).
    """

    out_channels: int
    norm: Optional[str] = None
    activation: str = "leaky_relu"
    k: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,            # [B, N, 3]
        features: jnp.ndarray,       # [B, N, C]
        sampled_xyz: jnp.ndarray | None = None,   # [B, S, 3] or None
        knn_indices: jnp.ndarray | None = None,   # [B, S, >=k] or None
        train: bool = False,
    ) -> jnp.ndarray:
        if sampled_xyz is None:
            sampled_xyz = xyz
        features = jnp.concatenate([xyz.astype(features.dtype), features], axis=-1)

        if knn_indices is not None:
            assert knn_indices.shape[1] == sampled_xyz.shape[1]
            assert knn_indices.shape[2] >= self.k
            knn_indices = knn_indices[:, :, : self.k]
        else:
            knn_indices = k_nearest_neighbor(xyz, sampled_xyz, self.k)  # [B,S,k]

        # one gather serves both: features[..., :3] IS xyz (concatenated
        # above), and TPU gathers are row-rate-bound so a separate 3-channel
        # xyz gather would cost as much as the full-row fetch. shared=True:
        # without the barrier XLA duplicated this gather into the weight-net
        # fusion AND the einsum fusion, paying the row fetch twice (PERF.md)
        knn_features = batch_gather(features, knn_indices, shared=True)
        knn_xyz = knn_features[..., :3].astype(jnp.float32)
        if features.dtype != jnp.float32:
            # coordinates must not round-trip through bf16
            knn_xyz = batch_gather(xyz, knn_indices)
        knn_xyz_norm = knn_xyz - sampled_xyz[:, :, None, :]

        # weights: [B, S, k, 16]
        weights = MLP([8, 16], activation=self.activation, dtype=self.dtype,
                      name="weight_net")(knn_xyz_norm.astype(features.dtype), train=train)

        # Contract over neighbors on the MXU: [B,S,16,k] @ [B,S,k,3+C]
        weighted = jnp.einsum(
            "bskw,bskc->bswc", weights, knn_features,
            preferred_element_type=jnp.float32,
        ).astype(features.dtype)
        b, s = weighted.shape[:2]
        weighted = weighted.reshape(b, s, -1)  # [B, S, 16*(3+C)], weight-major

        out = nn.Dense(self.out_channels, kernel_init=torch_kernel_init,
                       dtype=self.dtype, name="linear")(weighted)
        if self.norm == "batch_norm":
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype, name="norm_fn")(out)
        elif self.norm == "instance_norm":
            out = instance_norm(out)
        elif self.norm is not None:
            raise NotImplementedError(self.norm)
        return apply_activation(out, self.activation)
