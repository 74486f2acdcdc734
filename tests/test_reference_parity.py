"""Numerical parity of the full core network against the upstream reference.

Builds the reference RPEFlow_core (read-only mount, CPU torch, pure-torch op
fallbacks), converts its randomly-initialized weights with
compat.torch_loader, runs both cores on identical inputs through
encode -> encode_event -> decode, and compares every pyramid-level flow.

This is the analog of the reference's checkpoint-based integration testing
(SURVEY.md §4.3) without needing released checkpoints. The wrapper-level
pieces not exercised here (resize_to_64x, IDS transform, losses) have their
own oracle tests in test_ops_sampling/test_ops_geometry/test_losses.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from rpeflow_tpu.compat.torch_loader import assert_compatible, convert_state_dict
from rpeflow_tpu.model.core import RPEFlowCore
from rpeflow_tpu.ops.geometry import CameraInfo
from rpeflow_tpu.train.config import ConfigNode

CFG2D = ConfigNode({
    "event_bins": 2,
    "event_polarity": True,
    "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
             "context_network": None},
    "max_displacement": 4,
})
CFG3D = ConfigNode({
    "norm": {"feature_pyramid": "batch_norm", "correlation": None,
             "flow_estimator": None},
    "k": 8,
})

B, H, W, N = 1, 128, 128, 256
SAMPLES = [128, 64, 32, 16, 8]


def _patch_mi_for_cpu():
    """The reference MI heads sample with torch.cuda.FloatTensor (CUDA-only,
    mutual_info.py:32); eval outputs never depend on the draw, so replace it
    with a CPU normal draw."""
    from models import mutual_info as mi

    def reparam(self, mu, logvar):
        std = logvar.mul(0.5).exp()
        return torch.randn_like(std) * std + mu

    for cls in [mi.Mutual_info_reg_2D, mi.Mutual_info_reg_3D,
                mi.Mutual_info_reg_2D_Event, mi.Mutual_info_reg_3D_Event]:
        cls.reparametrize = reparam


@pytest.mark.reference_parity
@pytest.mark.slow
def test_core_decode_parity():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    _patch_mi_for_cpu()

    from models.RPEFlow_core import RPEFlow_core as TorchCore
    from models.pwc3d_core import build_pc_pyramid as torch_build_pyramid

    torch_core = TorchCore(CFG2D, CFG3D, None)
    torch_core.eval()

    # ---- inputs ----
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    event = rng.rand(B, H, W, 4).astype(np.float32)
    pc1 = rng.rand(B, N, 3).astype(np.float32) * 4 - 2
    pc2 = (pc1 + rng.randn(B, N, 3).astype(np.float32) * 0.05)
    pc1[..., 2] += 10.0
    pc2[..., 2] += 10.0

    f = np.full((B,), 120.0, np.float32)
    cx = np.full((B,), (W - 1) / 2, np.float32)
    cy = np.full((B,), (H - 1) / 2, np.float32)

    # ---- torch reference ----
    t_img1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
    t_img2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
    t_event = torch.from_numpy(event).permute(0, 3, 1, 2)
    t_pc1 = torch.from_numpy(pc1).permute(0, 2, 1)
    t_pc2 = torch.from_numpy(pc2).permute(0, 2, 1)
    cam_t = {
        "projection_mode": "perspective", "sensor_h": H, "sensor_w": W,
        "f": torch.from_numpy(f), "cx": torch.from_numpy(cx),
        "cy": torch.from_numpy(cy),
    }
    with torch.no_grad():
        xt1, xt2, st1, _ = torch_build_pyramid(t_pc1, t_pc2, SAMPLES)
        tf1_2d, tf1_3d = torch_core.encode(t_img1, xt1)
        tf2_2d, tf2_3d = torch_core.encode(t_img2, xt2)
        tef = torch_core.encode_event(t_event)
        t_flows2d, t_flows3d, _ = torch_core.decode(
            xt1, xt2, tf1_2d, tf2_2d, tf1_3d, tf2_3d, tef, cam_t)

    # ---- jax port with converted weights ----
    import jax

    from rpeflow_tpu.nn.pyramid3d import build_pc_pyramid

    core = RPEFlowCore(CFG2D, CFG3D)
    cam_j = CameraInfo("perspective", H, W, f, cx, cy)

    def fwd(mdl):
        xyzs1, xyzs2, _, _ = build_pc_pyramid(pc1, pc2, SAMPLES)
        f1_2d, f1_3d = mdl.encode(img1, xyzs1)
        f2_2d, f2_3d = mdl.encode(img2, xyzs2)
        ef = mdl.encode_event(event)
        return mdl.decode(xyzs1, xyzs2, f1_2d, f2_2d, f1_3d, f2_3d, ef, cam_j)

    variables = core.init({"params": jax.random.PRNGKey(0)}, method=fwd)
    converted = convert_state_dict(torch_core.state_dict())
    assert_compatible(variables["params"], converted["params"])
    assert_compatible(variables.get("batch_stats", {}),
                      converted.get("batch_stats", {}))

    j_flows2d, j_flows3d, _ = core.apply(converted, method=fwd)

    # ---- compare ----
    assert len(j_flows2d) == len(t_flows2d) == 5
    for lvl, (jf, tf) in enumerate(zip(j_flows2d, t_flows2d)):
        tf = tf.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(jf), tf, atol=5e-3, rtol=1e-3,
            err_msg=f"2D flow mismatch at level {lvl}")
    for lvl, (jf, tf) in enumerate(zip(j_flows3d, t_flows3d)):
        tf = tf.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(jf), tf, atol=5e-3, rtol=1e-3,
            err_msg=f"3D flow mismatch at level {lvl}")
