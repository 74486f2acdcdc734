"""RPEFlow core network: two-branch PWC encoder/decoder with event branch,
cross-modal MDTA fusion and mutual-information regularization.

TPU-native re-design of reference models/RPEFlow_core.py:14-432. Channels-last
throughout; the coarse-to-fine decode loop is statically unrolled over the 5
pyramid levels (each level has different static shapes), which is exactly what
XLA wants — no dynamic control flow, every conv/matmul statically shaped.

Module names mirror the torch attribute names (``pyramid_convs_0`` for
``pyramid_convs.0`` etc.) so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import ConvNormAct, torch_kernel_init
from ..nn.mdta import CrossTransformerBlock as _CrossTransformerBlock
from ..nn.mutual_info import MutualInfoReg

# The 20 fusion blocks hold the largest training activations (GDFN hidden
# width is ~5x the feature dim at finest-level resolution); rematerializing
# them in the backward pass trades ~10% recompute for the ~4x activation
# memory that otherwise OOMs HBM at batch 4 (jax.checkpoint == nn.remat).
# RPEFLOW_NO_REMAT=1 disables it — measured ~equal speed (667 vs 682 ms/step,
# the backward is bandwidth-bound not FLOP-bound) and, on the current
# XLA:TPU, the unchecked-pointed f32 graph MISCOMPILES at the flagship shape
# (finite inputs -> NaN forward; the remat boundaries limit fusion scope and
# dodge it — PERF.md "bf16 decode-fuser experiment"). Keep remat on.
import os as _os

if _os.environ.get("RPEFLOW_NO_REMAT"):
    CrossTransformerBlock = _CrossTransformerBlock
else:
    CrossTransformerBlock = nn.remat(_CrossTransformerBlock)
from ..nn.pyramid2d import ContextNetwork2D, FeaturePyramid2D, FlowEstimator2D, UpMaskHead2D
from ..nn.pyramid3d import Correlation3D, FeaturePyramid3D, FlowEstimator3D
from ..ops.correlation import correlation2d
from ..ops.geometry import CameraInfo, project_feat_with_nn_corr, project_pc2image
from ..ops.interp import backwarp_3d, convex_upsample, knn_interpolation, resize_bilinear_ac
from ..ops.knn import k_nearest_neighbor
from ..ops.sample import backwarp_2d, grid_sample_2d, mesh_grid


class _ConvexUpsampler(nn.Module):
    """RAFT upsample-mask head + convex combination, as one remat unit.

    The 6-D mask/neighbor tensors ([B,H,W,9,4,4]) tile catastrophically on
    TPU (14x padding expansion, >2 GB of saved residuals at 576x960);
    rematerializing the whole upsample keeps them out of training memory.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, flow_feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        mask = UpMaskHead2D(dtype=self.dtype, name="up_mask_head_2d")(flow_feat)
        return convex_upsample(flow, mask.astype(jnp.float32), scale_factor=4)


class PyramidFeatureFuser2D(nn.Module):
    """Bi-CLFM pyramid fusion, 3D->2D (reference RPEFlow_core.py:14-37)."""

    in_channels_2d: int
    num_heads: int
    norm: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_2d, feat_3d, nn_proj, compute_mi=False, train=False):
        feat_3d_to_2d = project_feat_with_nn_corr(xy, feat_2d, feat_3d, nn_proj[..., 0])
        out = ConvNormAct(self.in_channels_2d, norm=self.norm, dtype=self.dtype,
                          name="mlps_0")(feat_3d_to_2d, train=train)
        mi = (MutualInfoReg(self.in_channels_2d // 2, 2, dtype=self.dtype,
                            name="mi")(feat_2d, out)
              if compute_mi else jnp.float32(0.0))
        out = CrossTransformerBlock(self.in_channels_2d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_2d, out)
        return out, mi


class PyramidFeatureFuser3D(nn.Module):
    """Bi-CLFM pyramid fusion, 2D->3D (reference RPEFlow_core.py:40-60)."""

    in_channels_3d: int
    num_heads: int
    norm: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_2d, feat_3d, compute_mi=False, train=False):
        feat_2d_to_3d = jax.lax.stop_gradient(grid_sample_2d(feat_2d, xy))
        out = ConvNormAct(self.in_channels_3d, norm=self.norm, dtype=self.dtype,
                          name="mlps_0")(feat_2d_to_3d, train=train)
        mi = (MutualInfoReg(self.in_channels_3d // 2, 2, dtype=self.dtype,
                            name="mi")(feat_3d, out)
              if compute_mi else jnp.float32(0.0))
        out = CrossTransformerBlock(self.in_channels_3d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_3d, out)
        return out, mi


class CorrFeatureFuser2D(nn.Module):
    """Correlation fusion 3D->2D + event ingestion (reference RPEFlow_core.py:63-87)."""

    in_channels_2d: int   # cost-volume channels, (2d+1)^2
    in_channels_3d: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_2d, feat_3d, efeat_2d, last_flow_2d,
                 last_flow_3d_to_2d, nn_proj, compute_mi=False, train=False):
        feat_3d = jnp.concatenate(
            [feat_3d, last_flow_3d_to_2d.astype(feat_3d.dtype)], axis=-1)
        f32d = project_feat_with_nn_corr(xy, feat_2d, feat_3d, nn_proj[..., 0])
        f32d = jnp.concatenate(
            [f32d[..., :-2],
             f32d[..., -2:] - jax.lax.stop_gradient(last_flow_2d).astype(f32d.dtype)],
            axis=-1,
        )

        if compute_mi:
            head_3d = ConvNormAct(self.in_channels_2d, dtype=self.dtype,
                                  name="head_3d")(f32d, train=train)
            head_event = ConvNormAct(self.in_channels_2d, dtype=self.dtype,
                                     name="head_event")(efeat_2d, train=train)
            mi = MutualInfoReg(self.in_channels_2d // 2, 3, dtype=self.dtype,
                               name="mi")(feat_2d, head_3d, head_event)
        else:
            mi = jnp.float32(0.0)

        out = ConvNormAct(self.in_channels_3d + self.in_channels_2d,
                          dtype=self.dtype, name="mlps_0")(
            jnp.concatenate([f32d, efeat_2d], axis=-1), train=train)
        out = ConvNormAct(self.in_channels_2d, dtype=self.dtype,
                          name="mlps_1")(out, train=train)
        out = CrossTransformerBlock(self.in_channels_2d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_2d, out)
        return out, mi


class CorrFeatureFuser3D(nn.Module):
    """Correlation fusion 2D->3D + event ingestion (reference RPEFlow_core.py:90-118)."""

    in_channels_2d: int
    in_channels_3d: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_corr_2d, feat_corr_3d, efeat_2d, last_flow_3d,
                 last_flow_2d_to_3d, compute_mi=False, train=False):
        feat_2d_with_flow = jnp.concatenate(
            [feat_corr_2d, last_flow_2d_to_3d.astype(feat_corr_2d.dtype)], axis=-1)
        feat_2d_to_3d = grid_sample_2d(feat_2d_with_flow, xy)
        efeat_2d_to_3d = grid_sample_2d(efeat_2d, xy)
        feat_2d_to_3d = jnp.concatenate(
            [feat_2d_to_3d[..., :-2],
             feat_2d_to_3d[..., -2:] - last_flow_3d[..., :2].astype(feat_2d_to_3d.dtype)],
            axis=-1,
        )
        feat_2d_to_3d = jax.lax.stop_gradient(feat_2d_to_3d)
        efeat_2d_to_3d = jax.lax.stop_gradient(efeat_2d_to_3d)

        if compute_mi:
            head_2d = ConvNormAct(self.in_channels_3d, dtype=self.dtype,
                                  name="head_2d")(feat_2d_to_3d, train=train)
            mi = MutualInfoReg(self.in_channels_3d // 2, 3, dtype=self.dtype,
                               name="mi")(feat_corr_3d, head_2d, efeat_2d_to_3d)
        else:
            mi = jnp.float32(0.0)

        out = ConvNormAct(self.in_channels_2d + self.in_channels_3d,
                          dtype=self.dtype, name="mlps_0")(
            jnp.concatenate([feat_2d_to_3d, efeat_2d_to_3d], axis=-1), train=train)
        out = ConvNormAct(self.in_channels_3d, dtype=self.dtype,
                          name="mlps_1")(out, train=train)
        out = CrossTransformerBlock(self.in_channels_3d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_corr_3d, out)
        return out, mi


class DecoderFeatureFuser2D(nn.Module):
    """Decoder fusion 3D->2D (reference RPEFlow_core.py:121-141)."""

    in_channels_2d: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_2d, feat_3d, nn_proj, compute_mi=False, train=False):
        f32d = project_feat_with_nn_corr(xy, feat_2d, feat_3d, nn_proj[..., 0])
        out = ConvNormAct(self.in_channels_2d, dtype=self.dtype,
                          name="mlps_0")(f32d, train=train)
        mi = (MutualInfoReg(self.in_channels_2d // 2, 2, dtype=self.dtype,
                            name="mi")(feat_2d, out)
              if compute_mi else jnp.float32(0.0))
        out = CrossTransformerBlock(self.in_channels_2d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_2d, out)
        return out, mi


class DecoderFeatureFuser3D(nn.Module):
    """Decoder fusion 2D->3D (reference RPEFlow_core.py:144-162)."""

    in_channels_3d: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xy, feat_2d, feat_3d, compute_mi=False, train=False):
        feat_2d_to_3d = jax.lax.stop_gradient(grid_sample_2d(feat_2d, xy))
        out = ConvNormAct(self.in_channels_3d, dtype=self.dtype,
                          name="mlps_0")(feat_2d_to_3d, train=train)
        mi = (MutualInfoReg(self.in_channels_3d // 2, 2, dtype=self.dtype,
                            name="mi")(feat_3d, out)
              if compute_mi else jnp.float32(0.0))
        out = CrossTransformerBlock(self.in_channels_3d, self.num_heads,
                                    dtype=self.dtype, name="fuse")(feat_3d, out)
        return out, mi


# Per-level channel/head tables (reference RPEFlow_core.py:174-289).
_CH = [16, 32, 64, 96, 128, 192]          # pyramid channels, levels 0..5
_HEADS_PYR = [None, 1, 2, 2, 4, 4]
_HEADS_CORR_2D = [None, 1, 1, 3, 3, 3]
_HEADS_CORR_3D = [None, 1, 2, 2, 4, 4]


class RPEFlowCore(nn.Module):
    """Encoder/decoder assembly (reference RPEFlow_core.py:165-432).

    ``n_levels`` is the number of pyramid levels including level 0 (the
    flagship uses 6: full cloud + 5 FPS levels, decode over levels 5..1).
    Smaller values build a truncated-but-real model — same per-level module
    names and channel tables, just fewer levels — used by the multi-chip
    dryrun and the 8-device CPU tests where the fully unrolled 5-level
    decode makes XLA:CPU compile pathologically slow.
    """

    cfgs2d: Any
    cfgs3d: Any
    dtype: Any = None
    n_levels: int = 6
    amp: bool = False

    def setup(self):
        c2d = self.cfgs2d
        c3d = self.cfgs3d
        nl = self.n_levels
        assert 2 <= nl <= 6, f"n_levels must be in [2, 6], got {nl}"
        corr_ch = (2 * c2d.max_displacement + 1) ** 2
        event_bins = c2d.event_bins * 2 if c2d.event_polarity else c2d.event_bins
        self._corr_ch = corr_ch

        # ``amp`` = selective mixed precision: bf16 only inside the
        # conv-heavy image/event pyramids (bounded cast surface). Whole-model
        # bf16 (dtype=bf16) is pathological on TPU — a (16,128)-tile relayout
        # storm measured 6.5x SLOWER and the train graph did not finish
        # compiling in 28 min (PERF.md round 1) — so the trainer's YAML
        # ``amp: true`` maps here, never to a global dtype.
        pyr_dtype = (jnp.bfloat16
                     if self.amp or _os.environ.get("RPEFLOW_PYRAMID_BF16")
                     else self.dtype)
        # Experimental second amp scope: bf16 activations inside the 2-D
        # fusion/estimator blocks only (3-D branch, correlations, flows and
        # losses stay f32). Gated off by default — disables the f32-only
        # Pallas fused MDTA/GDFN paths.
        fus_dtype = (jnp.bfloat16 if _os.environ.get("RPEFLOW_FUSER_BF16")
                     else self.dtype)

        self.feature_pyramid_2d = FeaturePyramid2D(
            [3] + _CH[:nl], norm=c2d.norm.feature_pyramid, dtype=pyr_dtype,
            name="feature_pyramid_2d")
        self.efeature_pyramid_2d = FeaturePyramid2D(
            [event_bins, 32] + _CH[1:nl], norm=c2d.norm.feature_pyramid,
            dtype=pyr_dtype, name="efeature_pyramid_2d")

        self.feature_aligners_2d = [None] + [
            ConvNormAct(64, dtype=self.dtype, name=f"feature_aligners_2d_{i}")
            for i in range(1, nl)
        ]
        self.efeature_aligners_2d = [None] + [
            ConvNormAct(64, dtype=self.dtype, name=f"efeature_aligners_2d_{i}")
            for i in range(1, nl)
        ]

        self.flow_estimator_2d = FlowEstimator2D(
            [64 + 64 + corr_ch + 2 + 32, 192, 128, 96, 64, 32],
            norm=c2d.norm.flow_estimator, dtype=fus_dtype, name="flow_estimator_2d")
        self.context_network_2d = ContextNetwork2D(
            [self.flow_estimator_2d.flow_feat_dim + 2, 128, 128, 128, 96, 64, 32],
            dilations=[1, 2, 4, 8, 16, 1], norm=c2d.norm.context_network,
            dtype=fus_dtype, name="context_network_2d")
        self.convex_upsampler = nn.remat(_ConvexUpsampler)(
            dtype=self.dtype, name="convex_upsampler")

        self.feature_pyramid_3d = FeaturePyramid3D(
            _CH[:nl], norm=c3d.norm.feature_pyramid, k=c3d.k, dtype=self.dtype,
            name="feature_pyramid_3d")
        self.feature_aligners_3d = [None] + [
            ConvNormAct(64, dtype=self.dtype, name=f"feature_aligners_3d_{i}")
            for i in range(1, nl)
        ]
        self.correlations_3d = [None] + [
            Correlation3D(_CH[i], k=c3d.k, dtype=self.dtype,
                          name=f"correlations_3d_{i}")
            for i in range(1, nl)
        ]
        self.correlation_aligners_3d = [None] + [
            ConvNormAct(64, dtype=self.dtype, name=f"correlation_aligners_3d_{i}")
            for i in range(1, nl)
        ]
        self.flow_estimator_3d = FlowEstimator3D(
            [64 + 64 + 3 + 64, 128, 128, 64], norm=c3d.norm.flow_estimator,
            k=c3d.k, dtype=self.dtype, name="flow_estimator_3d")

        self.pyramid_feat_fusers_2d = [None] + [
            PyramidFeatureFuser2D(_CH[i], _HEADS_PYR[i], norm=c2d.norm.feature_pyramid,
                                  dtype=fus_dtype, name=f"pyramid_feat_fusers_2d_{i}")
            for i in range(1, nl)
        ]
        self.pyramid_feat_fusers_3d = [None] + [
            PyramidFeatureFuser3D(_CH[i], _HEADS_PYR[i], norm=c3d.norm.feature_pyramid,
                                  dtype=self.dtype, name=f"pyramid_feat_fusers_3d_{i}")
            for i in range(1, nl)
        ]
        self.corr_feat_fusers_2d = [None] + [
            CorrFeatureFuser2D(corr_ch, _CH[i], _HEADS_CORR_2D[i], dtype=fus_dtype,
                               name=f"corr_feat_fusers_2d_{i}")
            for i in range(1, nl)
        ]
        self.corr_feat_fusers_3d = [None] + [
            CorrFeatureFuser3D(corr_ch, _CH[i], _HEADS_CORR_3D[i], dtype=self.dtype,
                               name=f"corr_feat_fusers_3d_{i}")
            for i in range(1, nl)
        ]

        self.estimator_feat_fuser_2d = DecoderFeatureFuser2D(
            self.flow_estimator_2d.flow_feat_dim, 2, dtype=fus_dtype,
            name="estimator_feat_fuser_2d")
        self.estimator_feat_fuser_3d = DecoderFeatureFuser3D(
            64, 2, dtype=self.dtype, name="estimator_feat_fuser_3d")

        self.conv_last_2d = nn.Conv(2, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                                    kernel_init=torch_kernel_init, dtype=self.dtype,
                                    name="conv_last_2d")
        from ..nn.mdta import _pw_conv
        self.conv_last_3d = _pw_conv(3, True, self.dtype, "conv_last_3d", 1)

    def encode(self, image, xyzs, train=False):
        feats_2d = self.feature_pyramid_2d(image, train=train)
        feats_3d = self.feature_pyramid_3d(xyzs, train=train)
        return ([self._from_pyr(f) for f in feats_2d],
                [self._from_pyr(f) for f in feats_3d])

    def _from_pyr(self, f):
        """Confine the amp/pyramid bf16 scope to the pyramids themselves.

        flax ``dtype=None`` modules compute in their INPUT dtype, so without
        this boundary cast the pyramids' bf16 outputs silently switch the
        entire decode to bf16 — which on the current XLA:TPU triggers a
        context-dependent fusion miscompile at the flagship shape (finite
        inputs -> inf out of a depthwise conv; PERF.md "bf16 decode-fuser
        experiment"). Decode math also loses precision silently. No-op when
        the model dtype itself is bf16 (explicit whole-model opt-in).
        """
        if self.dtype is None and f.dtype != jnp.float32:
            return f.astype(jnp.float32)
        return f

    def encode_both(self, image1, image2, xyzs1, xyzs2, train=False):
        """Two-frame encode with the frames stacked along the batch axis.

        Halves the kernel count vs two per-frame calls (every conv/gather at
        2B batch instead of 2x B) — a dispatch-bound win on the coarse
        levels. Bit-exact at eval: batch norm uses running stats and every
        other op is per-sample. At train, stacking would compute BN batch
        statistics jointly over both frames where the reference normalizes
        each frame's batch separately (reference models/RPEFlow.py applies
        the shared pyramid per frame), so the trainer keeps per-frame calls.
        """
        b = image1.shape[0]
        image = jnp.concatenate([image1, image2], axis=0)
        xyzs = [jnp.concatenate([x1, x2], axis=0)
                for x1, x2 in zip(xyzs1, xyzs2)]
        feats_2d, feats_3d = self.encode(image, xyzs, train=train)
        return ([f[:b] for f in feats_2d], [f[b:] for f in feats_2d],
                [f[:b] for f in feats_3d], [f[b:] for f in feats_3d])

    def encode_event(self, event_voxel, train=False):
        feats = self.efeature_pyramid_2d(event_voxel, train=train)
        return [self._from_pyr(f) for f in feats]

    def decode_level(self, level, xyz1, xyz2, feat1_2d, feat2_2d, feat1_3d,
                     feat2_3d, efeat_2d, xyz1_up, camera: CameraInfo,
                     prev=None, compute_mi=False, train=False):
        """One coarse-to-fine decode iteration (reference RPEFlow_core.py:307-418).

        ``prev`` is ``None`` at the coarsest level; otherwise a dict with the
        previous (coarser) level's outputs ``flow_2d``, ``flow_3d``,
        ``flow_feat_2d``, ``flow_feat_3d`` (``xyz1_up`` is the coarser
        level's point set the 3-D flow lives on). Returns a dict with this
        level's ``flow_2d``, ``flow_3d``, ``flow_feat_2d``, ``flow_feat_3d``,
        ``last_flow_3d`` (the interpolation of the coarser flow onto this
        level's points — reused by :meth:`decode_post`; zeros at the coarsest
        level) and the mutual-information scalars ``mi2d``/``mi3d``.

        Extracted from the monolithic decode loop so the flagship forward
        can also run as per-level jit segments (model/segmented.py) — each
        segment's HLO graph stays far below the op-count scale where the
        current XLA:TPU toolchain miscompiles buffer assignment around
        ``tpu_custom_call`` (PERF.md "Round-3 root-cause chain").
        """
        b, h, w = feat1_2d.shape[0], feat1_2d.shape[1], feat1_2d.shape[2]
        n_points = xyz1.shape[1]
        max_disp = self.cfgs2d.max_displacement

        # project points to this level's image plane
        xy1 = project_pc2image(xyz1, camera)
        xy2 = project_pc2image(xyz2, camera)
        sx = (w - 1) / (camera.sensor_w - 1)
        sy = (h - 1) / (camera.sensor_h - 1)
        scale = jnp.array([sx, sy], jnp.float32)
        xy1 = xy1 * scale
        xy2 = xy2 * scale

        # pre-compute knn indices; the two frames' pixel-grid NN
        # searches are one batch-stacked call (no params — always exact)
        xy_s = jnp.concatenate([xy1, xy2], axis=0)
        grid = jnp.broadcast_to(
            mesh_grid(h, w).reshape(1, h * w, 2), (2 * b, h * w, 2))
        nn_proj = k_nearest_neighbor(xy_s, grid, 1)  # [2B, HW, 1]
        nn_proj1, nn_proj2 = nn_proj[:b], nn_proj[b:]
        knn_1in1 = k_nearest_neighbor(xyz1, xyz1, self.cfgs3d.k)

        # fuse pyramid features. At eval the two frames go through the
        # shared fuser as one 2B-batch call (bit-exact: BN is in
        # running-stats mode, everything else per-sample); at train the
        # frames stay separate so BN batch statistics match the
        # reference's per-frame application.
        if not train and not compute_mi:
            f2d_s = jnp.concatenate([feat1_2d, feat2_2d], axis=0)
            f3d_s = jnp.concatenate([feat1_3d, feat2_3d], axis=0)
            fs_2d, _ = self.pyramid_feat_fusers_2d[level](
                xy_s, f2d_s, f3d_s, nn_proj, False, train)
            fs_3d, _ = self.pyramid_feat_fusers_3d[level](
                xy_s, f2d_s, f3d_s, False, train)
            feat1_2d, feat2_2d = fs_2d[:b], fs_2d[b:]
            feat1_3d, feat2_3d = fs_3d[:b], fs_3d[b:]
            mi2d_1 = mi2d_2 = mi3d_1 = mi3d_2 = jnp.float32(0.0)
        else:
            f1_2d, mi2d_1 = self.pyramid_feat_fusers_2d[level](
                xy1, feat1_2d, feat1_3d, nn_proj1, compute_mi, train)
            f2_2d, mi2d_2 = self.pyramid_feat_fusers_2d[level](
                xy2, feat2_2d, feat2_3d, nn_proj2, compute_mi, train)
            f1_3d, mi3d_1 = self.pyramid_feat_fusers_3d[level](
                xy1, feat1_2d, feat1_3d, compute_mi, train)
            f2_3d, mi3d_2 = self.pyramid_feat_fusers_3d[level](
                xy2, feat2_2d, feat2_3d, compute_mi, train)
            feat1_2d, feat2_2d = f1_2d, f2_2d
            feat1_3d, feat2_3d = f1_3d, f2_3d

        if prev is None:
            dt = feat1_2d.dtype
            last_flow_2d = jnp.zeros((b, h, w, 2), jnp.float32)
            last_flow_3d = jnp.zeros((b, n_points, 3), jnp.float32)
            last_flow_feat_2d = jnp.zeros((b, h, w, 32), dt)
            last_flow_feat_3d = jnp.zeros((b, n_points, 64), dt)
            xyz2_warp, feat2_2d_warp = xyz2, feat2_2d
        else:
            last_flow_2d = resize_bilinear_ac(prev["flow_2d"] * 2.0, h, w)
            last_flow_feat_2d = resize_bilinear_ac(prev["flow_feat_2d"], h, w)
            feat2_2d_warp = backwarp_2d(feat2_2d, last_flow_2d, "border")

            flow_with_feat = jnp.concatenate(
                [prev["flow_3d"], prev["flow_feat_3d"].astype(jnp.float32)],
                axis=-1)
            up = knn_interpolation(xyz1_up, flow_with_feat, xyz1)
            last_flow_3d = up[..., :3]
            last_flow_feat_3d = up[..., 3:].astype(feat1_3d.dtype)
            xyz2_warp = backwarp_3d(xyz1, xyz2, last_flow_3d)

        # correlation (3D learned cost volume; 2D local cost volume)
        feat_corr_3d = self.correlations_3d[level](
            xyz1, feat1_3d, xyz2_warp, feat2_3d, knn_1in1, train=train)
        feat_corr_2d = nn.leaky_relu(
            correlation2d(feat1_2d.astype(jnp.float32),
                          feat2_2d_warp.astype(jnp.float32), max_disp),
            negative_slope=0.1).astype(feat1_2d.dtype)

        # fuse correlation features (events enter here)
        last_flow_3d_to_2d = last_flow_3d[..., :2] * scale
        last_flow_2d_to_3d = last_flow_2d / scale
        fc2d, mi2d_3 = self.corr_feat_fusers_2d[level](
            xy1, feat_corr_2d, feat_corr_3d, efeat_2d, last_flow_2d,
            last_flow_3d_to_2d, nn_proj1, compute_mi, train)
        fc3d, mi3d_3 = self.corr_feat_fusers_3d[level](
            xy1, feat_corr_2d, feat_corr_3d, efeat_2d, last_flow_3d,
            last_flow_2d_to_3d, compute_mi, train)
        feat_corr_2d, feat_corr_3d = fc2d, fc3d

        # align features to 64 channels
        feat1_2d = self.feature_aligners_2d[level](feat1_2d, train=train)
        feat1_3d = self.feature_aligners_3d[level](feat1_3d, train=train)
        efeat_al = self.efeature_aligners_2d[level](efeat_2d, train=train)
        feat_corr_3d = self.correlation_aligners_3d[level](feat_corr_3d, train=train)

        # flow estimators
        x_2d = jnp.concatenate(
            [feat_corr_2d, feat1_2d, efeat_al,
             last_flow_2d.astype(feat1_2d.dtype), last_flow_feat_2d], axis=-1)
        x_3d = jnp.concatenate(
            [feat_corr_3d, feat1_3d,
             last_flow_3d.astype(feat1_3d.dtype), last_flow_feat_3d], axis=-1)
        flow_feat_2d = self.flow_estimator_2d(x_2d, train=train)
        flow_feat_3d = self.flow_estimator_3d(xyz1, x_3d, knn_1in1, train=train)

        # fuse decoder features
        ff2d, mi2d_4 = self.estimator_feat_fuser_2d(
            xy1, flow_feat_2d, flow_feat_3d, nn_proj1, compute_mi, train)
        ff3d, mi3d_4 = self.estimator_feat_fuser_3d(
            xy1, flow_feat_2d, flow_feat_3d, compute_mi, train)
        flow_feat_2d, flow_feat_3d = ff2d, ff3d

        # flow deltas + residual connection
        flow_2d = last_flow_2d + self.conv_last_2d(flow_feat_2d).astype(jnp.float32)
        flow_3d = last_flow_3d + self.conv_last_3d(flow_feat_3d).astype(jnp.float32)

        # context refinement (2D only)
        flow_feat_2d, flow_delta_2d = self.context_network_2d(
            jnp.concatenate([flow_feat_2d, flow_2d.astype(flow_feat_2d.dtype)],
                            axis=-1), train=train)
        flow_2d = flow_2d + flow_delta_2d.astype(jnp.float32)

        return {
            "flow_2d": flow_2d,
            "flow_3d": flow_3d,
            "flow_feat_2d": flow_feat_2d,
            "flow_feat_3d": flow_feat_3d,
            "last_flow_3d": last_flow_3d,
            "mi2d": mi2d_1 + mi2d_2 + mi2d_3 + mi2d_4,
            "mi3d": mi3d_1 + mi3d_2 + mi3d_3 + mi3d_4,
        }

    def decode_post(self, flows_2d, flows_3d, flow_feat_2d_finest, xyzs1,
                    up_flow_cache):
        """Final upsampling after the level loop (reference RPEFlow_core.py:420-430).

        ``flows_2d``/``flows_3d`` arrive coarse->fine (loop append order);
        returns them fine->coarse at full output resolution.
        ``up_flow_cache[level]`` is level ``level``'s ``last_flow_3d``.
        """
        flows_2d = [f.astype(jnp.float32) for f in flows_2d][::-1]
        flows_3d = [f.astype(jnp.float32) for f in flows_3d][::-1]

        # convex upsampling of the finest 2D flow (RAFT-style), x4 bilinear
        # for the coarser ones
        flows_2d[0] = self.convex_upsampler(flow_feat_2d_finest, flows_2d[0])
        for i in range(1, len(flows_2d)):
            h, w = flows_2d[i].shape[1:3]
            flows_2d[i] = resize_bilinear_ac(flows_2d[i] * 4.0, h * 4, w * 4)

        # upsample each 3D flow to the next-finer point set. For i >= 1 the
        # decode loop at level i already interpolated level i+1's final flow
        # onto xyzs1[i] (it is that level's ``last_flow_3d``) — identical
        # inputs through the same deterministic op, so reuse it instead of
        # paying the KNN search + gather again; only the finest upsample
        # (onto the full input cloud) is new work.
        for i in range(len(flows_3d)):
            if i in up_flow_cache:
                flows_3d[i] = up_flow_cache[i]
            else:
                flows_3d[i] = knn_interpolation(xyzs1[i + 1], flows_3d[i],
                                                xyzs1[i])
        return flows_2d, flows_3d

    def decode(self, xyzs1, xyzs2, feats1_2d, feats2_2d, feats1_3d, feats2_3d,
               efeats_2d, camera: CameraInfo, compute_mi=False, train=False):
        """Coarse-to-fine decode (reference RPEFlow_core.py:302-432).

        All pyramid lists are level-indexed 0..5; the loop runs levels 5..1.
        Returns (flows_2d fine->coarse, flows_3d fine->coarse, mi_loss).
        """
        flows_2d, flows_3d, flow_feats_2d, flow_feats_3d = [], [], [], []
        # level -> interpolation of level+1's FINAL flow onto this level's
        # points, saved to skip the identical recomputation in the final
        # upsample loop (reference RPEFlow_core.py:430 re-runs the same
        # knn_interpolation the decode already did at :353-355)
        up_flow_cache = {}
        mi_loss = jnp.float32(0.0)

        prev = None
        for level in range(len(xyzs1) - 1, 0, -1):
            out = self.decode_level(
                level, xyzs1[level], xyzs2[level], feats1_2d[level],
                feats2_2d[level], feats1_3d[level], feats2_3d[level],
                efeats_2d[level], xyzs1[level + 1] if prev is not None else None,
                camera, prev=prev, compute_mi=compute_mi, train=train)
            if prev is not None:
                up_flow_cache[level] = out["last_flow_3d"]
            flows_2d.append(out["flow_2d"])
            flows_3d.append(out["flow_3d"])
            flow_feats_2d.append(out["flow_feat_2d"])
            flow_feats_3d.append(out["flow_feat_3d"])
            if compute_mi:
                mi_loss = mi_loss + (10.0 * out["mi2d"] + out["mi3d"]) \
                    * (0.85 ** (level - 1))
            prev = {k: out[k] for k in
                    ("flow_2d", "flow_3d", "flow_feat_2d", "flow_feat_3d")}

        flows_2d, flows_3d = self.decode_post(
            flows_2d, flows_3d, flow_feats_2d[-1], xyzs1, up_flow_cache)
        return flows_2d, flows_3d, mi_loss
