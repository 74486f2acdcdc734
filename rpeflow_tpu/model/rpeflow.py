"""RPEFlow model wrapper: input normalization, IDS transform, pyramid build,
loss assembly and in-graph metrics.

TPU-native re-design of reference models/RPEFlow.py:10-189 as a pure
function-of-parameters Flax module: ``apply`` returns (outputs, aux) instead
of stashing loss/summary on the module.

Device-side tensors are channels-last with fully static shapes:
  images       [B, H, W, 6]   (uint8 or float, both frames stacked)
  pcs          [B, N, 6]      (pc1 | pc2)
  event_voxel  [B, H, W, 2*bins]
  flow_2d      [B, H, W, 2|3] (optional target; 3rd channel = valid mask)
  flow_3d      [B, N, 3|4]    (optional target; 4th channel = occlusion/valid)
  intrinsics   [B, 3]         (f, cx, cy)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.losses import supervised_loss_2d, supervised_loss_3d
from ..nn.pyramid3d import build_pc_pyramid
from ..ops.geometry import CameraInfo, parallel2perspect, perspect2parallel
from ..ops.interp import resize_flow2d, resize_to_64x
from .core import RPEFlowCore

DEFAULT_N_SAMPLES = (4096, 2048, 1024, 512, 256)


class RPEFlow(nn.Module):
    """Joint 2D optical-flow + 3D scene-flow estimation model."""

    cfgs: Any
    dtype: Any = None
    n_samples_list: Sequence[int] = DEFAULT_N_SAMPLES
    amp: bool = False   # selective bf16 (see RPEFlowCore.amp)

    def setup(self):
        self.pwc_fusion_core = RPEFlowCore(
            self.cfgs.pwc2d, self.cfgs.pwc3d, dtype=self.dtype,
            n_levels=len(self.n_samples_list) + 1, amp=self.amp,
            name="pwc_fusion_core")

    def _cameras(self, inputs):
        """(persp_cam, paral_cam, decode_cam) from static shapes + intrinsics.

        Cheap and side-effect-free, so per-segment jits (seg_* methods below)
        can each rebuild the cameras from ``inputs`` instead of threading a
        CameraInfo (mixed static/traced fields) across jit boundaries.
        """
        origin_h, origin_w = inputs["images"].shape[1:3]
        h64, w64 = -(-origin_h // 64) * 64, -(-origin_w // 64) * 64
        intrinsics = inputs["intrinsics"].astype(jnp.float32)
        persp_cam = CameraInfo(
            projection_mode="perspective",
            sensor_h=origin_h, sensor_w=origin_w,
            f=intrinsics[:, 0], cx=intrinsics[:, 1], cy=intrinsics[:, 2],
        )
        if self.cfgs.ids.enabled:
            div = self.cfgs.ids.sensor_size_divisor
            ph, pw = h64 // div, w64 // div
            paral_cam = CameraInfo(
                projection_mode="parallel", sensor_h=ph, sensor_w=pw,
                f=None, cx=(pw - 1) / 2, cy=(ph - 1) / 2,
            )
            return persp_cam, paral_cam, paral_cam
        return persp_cam, None, persp_cam

    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        train: bool = False,
        compute_mi: bool = False,
        compute_loss: bool = False,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        # freeze_bn keeps batch-norm in eval mode during fine-tuning
        # (reference RPEFlow.py:26-29); only norm layers consume `train`.
        if getattr(self.cfgs, "freeze_bn", False):
            train = False

        images = inputs["images"].astype(jnp.float32) / 255.0
        pc1 = inputs["pcs"][..., :3].astype(jnp.float32)
        pc2 = inputs["pcs"][..., 3:].astype(jnp.float32)
        event_voxel = inputs["event_voxel"].astype(jnp.float32)

        origin_h, origin_w = images.shape[1:3]
        images = resize_to_64x(images)
        event_voxel = resize_to_64x(event_voxel)
        image1, image2 = images[..., :3], images[..., 3:]
        if self.dtype is not None:
            image1 = image1.astype(self.dtype)
            image2 = image2.astype(self.dtype)
            event_voxel = event_voxel.astype(self.dtype)

        persp_cam, paral_cam, decode_cam = self._cameras(inputs)
        if self.cfgs.ids.enabled:
            pc1 = perspect2parallel(pc1, persp_cam, paral_cam)
            pc2 = perspect2parallel(pc2, persp_cam, paral_cam)

        # encode
        xyzs1, xyzs2, sample_indices1, _ = build_pc_pyramid(
            pc1, pc2, list(self.n_samples_list))
        if train:
            # per-frame calls: BN batch statistics must match the
            # reference's per-frame application (see encode_both docstring)
            feats1_2d, feats1_3d = self.pwc_fusion_core.encode(
                image1, xyzs1, train=train)
            feats2_2d, feats2_3d = self.pwc_fusion_core.encode(
                image2, xyzs2, train=train)
        else:
            feats1_2d, feats2_2d, feats1_3d, feats2_3d = (
                self.pwc_fusion_core.encode_both(
                    image1, image2, xyzs1, xyzs2, train=train))
        efeats_2d = self.pwc_fusion_core.encode_event(event_voxel, train=train)

        # decode (flow 1->2)
        flows_2d, flows_3d, mi_loss = self.pwc_fusion_core.decode(
            xyzs1, xyzs2, feats1_2d, feats2_2d, feats1_3d, feats2_3d, efeats_2d,
            decode_cam, compute_mi=compute_mi, train=train)

        if self.cfgs.ids.enabled:
            flows_3d = [
                parallel2perspect(xyz1 + f, persp_cam, paral_cam)
                - parallel2perspect(xyz1, persp_cam, paral_cam)
                for xyz1, f in zip(xyzs1, flows_3d)
            ]

        final_flow_2d = resize_flow2d(flows_2d[0], origin_h, origin_w)
        final_flow_3d = flows_3d[0]
        outputs = {"flow_2d": final_flow_2d, "flow_3d": final_flow_3d}

        if not compute_loss or "flow_2d" not in inputs or "flow_3d" not in inputs:
            return outputs, {}

        target_2d = inputs["flow_2d"].astype(jnp.float32)
        target_3d = inputs["flow_3d"].astype(jnp.float32)
        loss_2d = supervised_loss_2d(flows_2d, target_2d, self.cfgs.loss2d)
        loss_3d = supervised_loss_3d(flows_3d, target_3d, self.cfgs.loss3d,
                                     sample_indices1) * 10.0
        final_mi_loss = mi_loss * 0.01
        loss = loss_2d + loss_3d + final_mi_loss

        summary = {
            "loss": loss,
            "loss_2d": loss_2d,
            "loss_3d": loss_3d,
            "mi_loss": final_mi_loss,
        }
        summary.update(flow_metrics(final_flow_2d, final_flow_3d, target_2d, target_3d))
        return outputs, {"loss": loss, "scalar_summary": summary}

    # ------------------------------------------------------------------
    # Segmented eval forward (model/segmented.py). The flagship forward can
    # run as several small jit segments instead of one ~7,900-HLO-op graph:
    # the current XLA:TPU toolchain miscompiles buffer assignment around
    # ``tpu_custom_call`` only at full-graph scale (PERF.md "Round-3
    # root-cause chain"; triage/repro_xla_custom_call.log shows small graphs
    # are immune), so per-level segments let the quarantined Pallas kernels
    # run correctly. Eval-path only (train=False, no MI): semantics are
    # identical to ``__call__`` with ``train=False, compute_mi=False,
    # compute_loss=False`` — tests/test_segmented.py asserts equality.
    # ------------------------------------------------------------------

    def seg_encode(self, inputs):
        """Segment 1: normalize + IDS transform + pyramids (incl. the FPS
        custom call) + event encode. Mirrors ``__call__`` up to the decode
        call (reference models/RPEFlow.py:37-83)."""
        images = inputs["images"].astype(jnp.float32) / 255.0
        pc1 = inputs["pcs"][..., :3].astype(jnp.float32)
        pc2 = inputs["pcs"][..., 3:].astype(jnp.float32)
        event_voxel = inputs["event_voxel"].astype(jnp.float32)

        images = resize_to_64x(images)
        event_voxel = resize_to_64x(event_voxel)
        image1, image2 = images[..., :3], images[..., 3:]
        if self.dtype is not None:
            image1 = image1.astype(self.dtype)
            image2 = image2.astype(self.dtype)
            event_voxel = event_voxel.astype(self.dtype)

        persp_cam, paral_cam, _ = self._cameras(inputs)
        if self.cfgs.ids.enabled:
            pc1 = perspect2parallel(pc1, persp_cam, paral_cam)
            pc2 = perspect2parallel(pc2, persp_cam, paral_cam)

        xyzs1, xyzs2, _, _ = build_pc_pyramid(
            pc1, pc2, list(self.n_samples_list))
        feats1_2d, feats2_2d, feats1_3d, feats2_3d = (
            self.pwc_fusion_core.encode_both(
                image1, image2, xyzs1, xyzs2, train=False))
        efeats_2d = self.pwc_fusion_core.encode_event(event_voxel, train=False)
        return {
            "xyzs1": list(xyzs1), "xyzs2": list(xyzs2),
            "feats1_2d": list(feats1_2d), "feats2_2d": list(feats2_2d),
            "feats1_3d": list(feats1_3d), "feats2_3d": list(feats2_3d),
            "efeats_2d": list(efeats_2d),
        }

    # -- training variants (train/segmented_step.py). Same segment
    # boundaries as the eval path, but: per-frame encode (reference BN
    # batch-statistics semantics), compute_mi=True with the "mi" rng
    # collection, batch_stats mutable, and a loss/metric epilogue. The
    # custom-VJP kernels are healthy inside these per-level graphs just as
    # at eval; their backwards are XLA compositions either way.

    def _train_flag(self) -> bool:
        # freeze_bn keeps batch-norm in eval mode during fine-tuning
        # (reference RPEFlow.py:26-29); only norm layers consume `train`.
        return not getattr(self.cfgs, "freeze_bn", False)

    def seg_encode_train(self, inputs):
        """Training segment 1; also returns the pyramid sample indices the
        3-D loss subsets targets with (reference losses3d.py:6-38)."""
        train = self._train_flag()
        images = inputs["images"].astype(jnp.float32) / 255.0
        pc1 = inputs["pcs"][..., :3].astype(jnp.float32)
        pc2 = inputs["pcs"][..., 3:].astype(jnp.float32)
        event_voxel = inputs["event_voxel"].astype(jnp.float32)

        images = resize_to_64x(images)
        event_voxel = resize_to_64x(event_voxel)
        image1, image2 = images[..., :3], images[..., 3:]
        if self.dtype is not None:
            image1 = image1.astype(self.dtype)
            image2 = image2.astype(self.dtype)
            event_voxel = event_voxel.astype(self.dtype)

        persp_cam, paral_cam, _ = self._cameras(inputs)
        if self.cfgs.ids.enabled:
            pc1 = perspect2parallel(pc1, persp_cam, paral_cam)
            pc2 = perspect2parallel(pc2, persp_cam, paral_cam)

        xyzs1, xyzs2, sample_indices1, _ = build_pc_pyramid(
            pc1, pc2, list(self.n_samples_list))
        # per-frame calls: BN batch statistics must match the reference's
        # per-frame application (see encode_both docstring)
        feats1_2d, feats1_3d = self.pwc_fusion_core.encode(
            image1, xyzs1, train=train)
        feats2_2d, feats2_3d = self.pwc_fusion_core.encode(
            image2, xyzs2, train=train)
        efeats_2d = self.pwc_fusion_core.encode_event(event_voxel, train=train)
        return {
            "xyzs1": list(xyzs1), "xyzs2": list(xyzs2),
            "feats1_2d": list(feats1_2d), "feats2_2d": list(feats2_2d),
            "feats1_3d": list(feats1_3d), "feats2_3d": list(feats2_3d),
            "efeats_2d": list(efeats_2d),
            "sample_indices1": list(sample_indices1),
        }

    def seg_decode_level_train(self, inputs, level, xyz1, xyz2, xyz1_up,
                               feat1_2d, feat2_2d, feat1_3d, feat2_3d,
                               efeat_2d, prev, compute_mi=True):
        _, _, decode_cam = self._cameras(inputs)
        return self.pwc_fusion_core.decode_level(
            level, xyz1, xyz2, feat1_2d, feat2_2d, feat1_3d, feat2_3d,
            efeat_2d, xyz1_up, decode_cam, prev=prev,
            compute_mi=compute_mi, train=self._train_flag())

    def seg_finalize_train(self, inputs, flows_2d, flows_3d,
                           flow_feat_2d_finest, up_flow_cache, xyzs1,
                           sample_indices1, mi_levels):
        """Training epilogue: upsampling + IDS untransform + losses +
        in-graph metrics (mirrors ``__call__``'s tail with
        compute_loss=True). ``mi_levels`` is {level: (mi2d, mi3d)}."""
        origin_h, origin_w = inputs["images"].shape[1:3]
        persp_cam, paral_cam, _ = self._cameras(inputs)
        flows_2d, flows_3d = self.pwc_fusion_core.decode_post(
            list(flows_2d), list(flows_3d), flow_feat_2d_finest,
            list(xyzs1), dict(up_flow_cache))
        if self.cfgs.ids.enabled:
            flows_3d = [
                parallel2perspect(xyz1 + f, persp_cam, paral_cam)
                - parallel2perspect(xyz1, persp_cam, paral_cam)
                for xyz1, f in zip(xyzs1, flows_3d)
            ]
        final_flow_2d = resize_flow2d(flows_2d[0], origin_h, origin_w)
        final_flow_3d = flows_3d[0]

        mi_loss = jnp.float32(0.0)
        for level, (mi2d, mi3d) in sorted(mi_levels.items()):
            mi_loss = mi_loss + (10.0 * mi2d + mi3d) * (0.85 ** (level - 1))

        target_2d = inputs["flow_2d"].astype(jnp.float32)
        target_3d = inputs["flow_3d"].astype(jnp.float32)
        loss_2d = supervised_loss_2d(flows_2d, target_2d, self.cfgs.loss2d)
        loss_3d = supervised_loss_3d(flows_3d, target_3d, self.cfgs.loss3d,
                                     sample_indices1) * 10.0
        final_mi_loss = mi_loss * 0.01
        loss = loss_2d + loss_3d + final_mi_loss

        summary = {
            "loss": loss,
            "loss_2d": loss_2d,
            "loss_3d": loss_3d,
            "mi_loss": final_mi_loss,
        }
        summary.update(flow_metrics(final_flow_2d, final_flow_3d,
                                    target_2d, target_3d))
        outputs = {"flow_2d": final_flow_2d, "flow_3d": final_flow_3d}
        return loss, (outputs, summary)

    def seg_decode_level(self, inputs, level, xyz1, xyz2, xyz1_up, feat1_2d,
                         feat2_2d, feat1_3d, feat2_3d, efeat_2d, prev):
        """Segment 2..k: one decode level. ``inputs`` is only read for the
        camera rebuild (intrinsics + static shapes); unused arrays are
        dead-code-eliminated by XLA."""
        _, _, decode_cam = self._cameras(inputs)
        return self.pwc_fusion_core.decode_level(
            level, xyz1, xyz2, feat1_2d, feat2_2d, feat1_3d, feat2_3d,
            efeat_2d, xyz1_up, decode_cam, prev=prev,
            compute_mi=False, train=False)

    def seg_finalize(self, inputs, flows_2d, flows_3d, flow_feat_2d_finest,
                     up_flow_cache, xyzs1):
        """Final segment: upsampling + IDS untransform + output resize
        (mirrors ``__call__`` after the decode loop; lists arrive
        coarse->fine in decode-loop append order)."""
        origin_h, origin_w = inputs["images"].shape[1:3]
        persp_cam, paral_cam, _ = self._cameras(inputs)
        flows_2d, flows_3d = self.pwc_fusion_core.decode_post(
            list(flows_2d), list(flows_3d), flow_feat_2d_finest,
            list(xyzs1), dict(up_flow_cache))
        if self.cfgs.ids.enabled:
            flows_3d = [
                parallel2perspect(xyz1 + f, persp_cam, paral_cam)
                - parallel2perspect(xyz1, persp_cam, paral_cam)
                for xyz1, f in zip(xyzs1, flows_3d)
            ]
        final_flow_2d = resize_flow2d(flows_2d[0], origin_h, origin_w)
        return {"flow_2d": final_flow_2d, "flow_3d": flows_3d[0]}


def flow_metrics(
    flow_2d: jnp.ndarray,
    flow_3d: jnp.ndarray,
    target_2d: jnp.ndarray,
    target_3d: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """In-graph EPE / accuracy / outlier metrics (reference RPEFlow.py:115-155).

    Batch-mean of per-sample masked means, matching the torch computation.
    """
    flow_2d = jax.lax.stop_gradient(flow_2d.astype(jnp.float32))
    flow_3d = jax.lax.stop_gradient(flow_3d.astype(jnp.float32))

    if target_2d.shape[-1] == 3:
        mask2d = target_2d[..., 2] > 0
        t2d = target_2d[..., :2]
    else:
        mask2d = jnp.ones(target_2d.shape[:3], bool)
        t2d = target_2d
    m2d = mask2d.astype(jnp.float32)
    # zero-count guard: a fully-masked sample contributes 0-sums / 1 = 0
    # instead of NaN-poisoning the batch-mean summary scalars (the
    # evaluator has the same guard host-side, evaluator.py)
    cnt2d = jnp.maximum(jnp.sum(m2d, axis=(1, 2)), 1.0)

    epe2d_map = jnp.linalg.norm(flow_2d - t2d, axis=-1) * m2d
    epe2d = jnp.mean(jnp.sum(epe2d_map, axis=(1, 2)) / cnt2d)
    acc1px = jnp.mean(
        jnp.sum((epe2d_map < 1.0) * m2d, axis=(1, 2)) / cnt2d)
    mag = jnp.linalg.norm(t2d, axis=-1) + 1e-5
    outlier_map = ((epe2d_map > 3.0) & (epe2d_map / mag > 0.05)).astype(jnp.float32) * m2d
    outlier2d = jnp.mean(jnp.sum(outlier_map, axis=(1, 2)) / cnt2d)

    if target_3d.shape[-1] == 4:
        mask3d = target_3d[..., 3] > 0
        t3d = target_3d[..., :3]
    else:
        mask3d = jnp.ones(target_3d.shape[:2], bool)
        t3d = target_3d
    m3d = mask3d.astype(jnp.float32)
    cnt3d = jnp.maximum(jnp.sum(m3d, axis=1), 1.0)

    epe3d_map = jnp.linalg.norm(flow_3d - t3d, axis=-1) * m3d
    epe3d = jnp.mean(jnp.sum(epe3d_map, axis=1) / cnt3d)
    acc5cm = jnp.mean(jnp.sum((epe3d_map < 0.05) * m3d, axis=1) / cnt3d)

    return {
        "epe2d": epe2d,
        "acc2d_1px": acc1px,
        "outlier2d": outlier2d,
        "epe3d": epe3d,
        "acc3d_5cm": acc5cm,
    }


def is_better(curr_summary: Optional[dict], best_summary: Optional[dict]) -> bool:
    """Checkpoint selection rule (reference RPEFlow.py:185-189)."""
    if best_summary is None:
        return True
    return float(curr_summary["outlier2d"]) < float(best_summary["outlier2d"])
