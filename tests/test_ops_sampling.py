"""Parity tests for bilinear sampling / warping / resizing vs torch.

These are the classic silent-mismatch sources (align_corners, grid_sample
padding modes — see SURVEY.md §7 hard part 3), so each is pinned against a
torch oracle using the exact call signature the reference uses.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rpeflow_tpu.ops import (
    backwarp_2d,
    convex_upsample,
    grid_sample_2d,
    knn_interpolation,
    mesh_grid,
    resize_bilinear_ac,
    resize_flow2d,
)


def _torch_grid_sample_points(feat_nchw, xy, padding_mode):
    """Reference-style point sampling (models/utils.py:288-294)."""
    h, w = feat_nchw.shape[2:]
    new_x = 2.0 * xy[:, :, 0] / (w - 1) - 1.0
    new_y = 2.0 * xy[:, :, 1] / (h - 1) - 1.0
    grid = torch.stack([new_x, new_y], dim=-1)[:, :, None]  # [B, Q, 1, 2]
    out = F.grid_sample(feat_nchw, grid, mode="bilinear",
                        padding_mode=padding_mode, align_corners=True)
    return out[..., 0].permute(0, 2, 1)  # [B, Q, C]


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding):
    feat = rng.randn(2, 12, 17, 5).astype(np.float32)
    # Positions both inside and well outside the image.
    xy = (rng.rand(2, 40, 2).astype(np.float32) * 24 - 4)
    out = np.asarray(grid_sample_2d(feat, xy, padding_mode=padding))
    ref = _torch_grid_sample_points(
        torch.from_numpy(feat).permute(0, 3, 1, 2), torch.from_numpy(xy), padding
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_backwarp_2d_matches_torch(rng):
    feat = rng.randn(2, 10, 14, 6).astype(np.float32)
    flow = rng.randn(2, 10, 14, 2).astype(np.float32) * 3

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    # torch reference: grid + flow, normalized, border padding, align_corners
    b, _, h, w = t_feat.shape
    xb = torch.arange(w, dtype=torch.float32)[None, None, :].expand(b, h, w)
    yb = torch.arange(h, dtype=torch.float32)[None, :, None].expand(b, h, w)
    grid = torch.stack([xb, yb], 1) + t_flow
    gx = 2.0 * grid[:, 0] / (w - 1) - 1.0
    gy = 2.0 * grid[:, 1] / (h - 1) - 1.0
    ref = F.grid_sample(t_feat, torch.stack([gx, gy], -1),
                        padding_mode="border", align_corners=True)
    out = np.asarray(backwarp_2d(feat, flow, padding_mode="border"))
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("hw,to", [((9, 15), (18, 30)), ((18, 30), (72, 120)), ((7, 5), (20, 11))])
def test_resize_bilinear_ac_matches_torch(rng, hw, to):
    x = rng.randn(2, *hw, 4).astype(np.float32)
    out = np.asarray(resize_bilinear_ac(x, *to))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=to,
                        mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_resize_flow2d_matches_torch(rng):
    flow = rng.randn(2, 16, 24, 2).astype(np.float32)
    out = np.asarray(resize_flow2d(flow, 64, 96))
    t = F.interpolate(torch.from_numpy(flow).permute(0, 3, 1, 2), size=(64, 96),
                      mode="bilinear", align_corners=True)
    t[:, 0] *= 96 / 24
    t[:, 1] *= 64 / 16
    np.testing.assert_allclose(out, t.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_knn_interpolation_matches_manual(rng):
    inp_xyz = rng.randn(2, 50, 3).astype(np.float32)
    feats = rng.randn(2, 50, 7).astype(np.float32)
    qry = rng.randn(2, 30, 3).astype(np.float32)
    out = np.asarray(knn_interpolation(inp_xyz, feats, qry, k=3))
    for b in range(2):
        d = np.linalg.norm(inp_xyz[b][None] - qry[b][:, None], axis=-1)  # [Q, N]
        idx = np.argsort(d, -1)[:, :3]
        dd = np.maximum(np.take_along_axis(d, idx, -1), 1e-8)
        wgt = (1 / dd) / (1 / dd).sum(-1, keepdims=True)
        ref = (feats[b][idx] * wgt[..., None]).sum(1)
        np.testing.assert_allclose(out[b], ref, atol=1e-4)


def test_convex_upsample_matches_torch(rng):
    """Oracle: the RAFT unfold formulation (reference models/utils.py:201-214)."""
    flow = rng.randn(2, 6, 8, 2).astype(np.float32)
    mask = rng.randn(2, 6, 8, 9 * 16).astype(np.float32)

    out = np.asarray(convex_upsample(flow, mask, scale_factor=4))

    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    b, _, h, w = t_flow.shape
    m = t_mask.view(b, 1, 9, 4, 4, h, w)
    m = torch.softmax(m, dim=2)
    up = F.unfold(t_flow * 4, [3, 3], padding=1)
    up = up.view(b, 2, 9, 1, 1, h, w)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, h * 4, w * 4)
    np.testing.assert_allclose(out, up.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_mesh_grid_layout():
    g = np.asarray(mesh_grid(3, 4))
    assert g.shape == (3, 4, 2)
    np.testing.assert_array_equal(g[..., 0], np.tile(np.arange(4), (3, 1)))
    np.testing.assert_array_equal(g[..., 1], np.tile(np.arange(3)[:, None], (1, 4)))


def test_convex_upsample_d2s_matches_reshape(rng):
    """The TPU conv_transpose depth-to-space finish must equal the exact
    reshape+transpose path (the CPU suite otherwise never exercises it)."""
    import jax.numpy as jnp

    flow = jnp.asarray(rng.randn(2, 6, 9, 2).astype(np.float32) * 3)
    mask = jnp.asarray(rng.randn(2, 6, 9, 9 * 16).astype(np.float32))
    ref = np.asarray(convex_upsample(flow, mask, 4, use_d2s_conv=False))
    d2s = np.asarray(convex_upsample(flow, mask, 4, use_d2s_conv=True))
    np.testing.assert_allclose(d2s, ref, atol=1e-5, rtol=1e-5)
