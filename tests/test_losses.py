"""Supervised 2D/3D loss parity against the reference implementations."""

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from rpeflow_tpu.nn.losses import supervised_loss_2d, supervised_loss_3d
from rpeflow_tpu.train.config import ConfigNode

CFG_L2 = ConfigNode({"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"})
CFG_L1 = ConfigNode({"level_weights": [8, 4, 2, 1, 0.5], "order": "l1"})


def _to_torch_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x)).permute(0, 3, 1, 2)


@pytest.mark.parametrize("cfg,order", [(CFG_L2, "l2"), (CFG_L1, "l1")])
@pytest.mark.parametrize("sparse", [False, True])
def test_loss_2d_matches_reference(rng, cfg, order, sparse):
    from models import losses2d as ref

    h, w = 32, 48
    flows = [rng.randn(2, h // s, w // s, 2).astype(np.float32) * 3
             for s in (1, 2, 4, 8, 16)]
    if sparse:
        target = rng.randn(2, h, w, 3).astype(np.float32)
        target[..., 2] = (rng.rand(2, h, w) > 0.3).astype(np.float32)
    else:
        target = rng.randn(2, h, w, 2).astype(np.float32)

    mine = float(supervised_loss_2d(flows, target, cfg))
    t_flows = [_to_torch_nchw(f) for f in flows]
    ref_val = float(ref.calc_supervised_loss_2d(t_flows, _to_torch_nchw(target), cfg))
    assert mine == pytest.approx(ref_val, rel=1e-4)


@pytest.mark.parametrize("cfg", [CFG_L2, CFG_L1])
@pytest.mark.parametrize("masked", [False, True])
def test_loss_3d_matches_reference(rng, cfg, masked):
    from models import losses3d as ref

    n = 64
    sizes = [n, 32, 16, 8, 4]
    flows = [rng.randn(2, s, 3).astype(np.float32) for s in sizes]
    indices = [np.stack([rng.permutation(n)[:s] for _ in range(2)]).astype(np.int32)
               for s in sizes]
    c = 4 if masked else 3
    target = rng.randn(2, n, c).astype(np.float32)
    if masked:
        target[..., 3] = (rng.rand(2, n) > 0.3).astype(np.float32)

    mine = float(supervised_loss_3d(flows, target, cfg, indices))
    t_flows = [torch.from_numpy(f).permute(0, 2, 1) for f in flows]
    t_idx = [torch.from_numpy(i.astype(np.int64)) for i in indices]
    ref_val = float(ref.calc_supervised_loss_3d(
        t_flows, torch.from_numpy(target).permute(0, 2, 1), cfg, t_idx))
    assert mine == pytest.approx(ref_val, rel=1e-4)
