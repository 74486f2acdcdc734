"""3D (Point-PWC) branch: pc pyramid, feature pyramid, learned cost volume,
flow estimator.

TPU-native equivalents of reference models/pwc3d_core.py:8-148. All point
tensors are channels-last ``[B, N, C]``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.fps import furthest_point_sampling
from ..ops.gather import batch_gather, batch_gather_xyz_feat
from ..ops.knn import k_nearest_neighbor
from .layers import MLP, torch_kernel_init
from .pointconv import PointConv


def build_pc_pyramid(
    pc1: jnp.ndarray, pc2: jnp.ndarray, n_samples_list: Sequence[int]
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
    """One FPS pass of max(n_samples), prefix-sliced per level.

    Mirrors reference models/pwc3d_core.py:8-28: both clouds are stacked on
    the batch axis so a single FPS launch covers them.

    Args:
      pc1, pc2: ``[B, N, 3]``.
    Returns:
      (xyzs1, xyzs2, sample_indices1, sample_indices2): level-0 entry is the
      full cloud / arange indices; levels 1.. are the FPS prefixes.
    """
    b, n, _ = pc1.shape
    pc_both = jnp.concatenate([pc1, pc2], axis=0)
    idx_both = furthest_point_sampling(pc_both, max(n_samples_list))  # [2B, S]
    idx1, idx2 = idx_both[:b], idx_both[b:]

    lv0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    xyzs1, xyzs2 = [pc1], [pc2]
    indices1, indices2 = [lv0], [lv0]
    for n_samples in n_samples_list:
        indices1.append(idx1[:, :n_samples])
        indices2.append(idx2[:, :n_samples])
        xyzs1.append(batch_gather(pc1, idx1[:, :n_samples]))
        xyzs2.append(batch_gather(pc2, idx2[:, :n_samples]))
    return xyzs1, xyzs2, indices1, indices2


class FeaturePyramid3D(nn.Module):
    """Point feature pyramid (reference models/pwc3d_core.py:31-57).

    Level-0 features come from an MLP over a zeros tensor (geometry enters
    through the PointConv xyz-concat), faithfully matching the reference.
    """

    n_channels: Sequence[int]
    norm: Optional[str] = None
    k: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xyzs: Sequence[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        assert len(xyzs) == len(self.n_channels)
        zeros = jnp.zeros_like(xyzs[0])
        if self.dtype is not None:
            zeros = zeros.astype(self.dtype)
        feats = [MLP([self.n_channels[0], self.n_channels[0]], dtype=self.dtype,
                     name="level0_mlp")(zeros, train=train)]
        for i in range(len(xyzs) - 1):
            f = MLP([self.n_channels[i], self.n_channels[i + 1]], dtype=self.dtype,
                    name=f"pyramid_mlps_{i}")(feats[-1], train=train)
            feats.append(
                PointConv(self.n_channels[i + 1], norm=self.norm, k=self.k,
                          dtype=self.dtype, name=f"pyramid_convs_{i}")(
                    xyzs[i], f, sampled_xyz=xyzs[i + 1], train=train)
            )
        return feats


class Correlation3D(nn.Module):
    """Learned two-hop point cost volume (reference models/pwc3d_core.py:60-117).

    Point-to-point MLP cost over k neighbors in pc2, aggregated with a
    weight-net over relative xyz, then re-aggregated over k self-neighbors
    in pc1.
    """

    out_channels: int
    k: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,   # [B, N, 3]
        feat1: jnp.ndarray,  # [B, N, C]
        xyz2: jnp.ndarray,   # [B, N, 3]
        feat2: jnp.ndarray,  # [B, N, C]
        knn_indices_1in1: jnp.ndarray | None = None,  # [B, N, k]
        train: bool = False,
    ) -> jnp.ndarray:
        b, n, c = feat1.shape
        k = self.k

        knn_1in2 = k_nearest_neighbor(xyz2, xyz1, k)  # [B, N, k]
        # fused [xyz2|feat2] row fetch (gathers are row-rate-bound, PERF.md)
        knn_xyz2, knn_feat2 = batch_gather_xyz_feat(xyz2, feat2, knn_1in2)
        knn_xyz2_norm = (knn_xyz2 - xyz1[:, :, None, :]).astype(feat1.dtype)
        feat1_exp = jnp.broadcast_to(feat1[:, :, None, :], (b, n, k, c))

        concat = jnp.concatenate([feat1_exp, knn_feat2, knn_xyz2_norm], axis=-1)
        p2p_cost = MLP([self.out_channels, self.out_channels],
                       activation="leaky_relu", dtype=self.dtype,
                       name="cost_mlp")(concat, train=train)  # [B,N,k,O]

        weights2 = MLP([8, 8, self.out_channels], activation="relu",
                       dtype=self.dtype, name="weight_net2")(knn_xyz2_norm, train=train)
        p2n_cost = jnp.sum(weights2 * p2p_cost, axis=2)  # [B, N, O]

        if knn_indices_1in1 is None:
            knn_indices_1in1 = k_nearest_neighbor(xyz1, xyz1, k)
        knn_xyz1, n2n = batch_gather_xyz_feat(xyz1, p2n_cost, knn_indices_1in1)
        knn_xyz1_norm = (knn_xyz1 - xyz1[:, :, None, :]).astype(feat1.dtype)
        weights1 = MLP([8, 8, self.out_channels], activation="relu",
                       dtype=self.dtype, name="weight_net1")(knn_xyz1_norm, train=train)
        return jnp.sum(weights1 * n2n, axis=2)  # [B, N, O]


class FlowEstimator3D(nn.Module):
    """Two PointConvs + MLP (reference models/pwc3d_core.py:120-148)."""

    n_channels: Sequence[int]
    norm: Optional[str] = None
    k: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        feat: jnp.ndarray,
        knn_indices: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        feat = PointConv(self.n_channels[1], norm=self.norm, k=self.k,
                         dtype=self.dtype, name="point_conv1")(
            xyz, feat, knn_indices=knn_indices, train=train)
        feat = PointConv(self.n_channels[2], norm=self.norm, k=self.k,
                         dtype=self.dtype, name="point_conv2")(
            xyz, feat, knn_indices=knn_indices, train=train)
        return MLP([self.n_channels[2], self.n_channels[3]], dtype=self.dtype,
                   name="mlp")(feat, train=train)
