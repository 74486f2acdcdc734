"""Golden tests for camera projection and IDS transforms."""

import numpy as np

from rpeflow_tpu.ops import (
    CameraInfo,
    parallel2perspect,
    perspect2parallel,
    project_pc2image,
)


def _persp(b=2, h=540, w=960):
    return CameraInfo("perspective", h, w,
                      f=np.full((b,), 1050.0, np.float32),
                      cx=np.full((b,), 479.5, np.float32),
                      cy=np.full((b,), 269.5, np.float32))


def _paral(h=18, w=30):
    return CameraInfo("parallel", h, w, f=None, cx=(w - 1) / 2, cy=(h - 1) / 2)


def test_project_perspective(rng):
    pc = rng.rand(2, 64, 3).astype(np.float32) + np.array([0, 0, 5], np.float32)
    cam = _persp()
    xy = np.asarray(project_pc2image(pc, cam))
    ref_x = 479.5 + 1050.0 / pc[..., 2] * pc[..., 0]
    ref_y = 269.5 + 1050.0 / pc[..., 2] * pc[..., 1]
    np.testing.assert_allclose(xy[..., 0], ref_x, rtol=1e-5)
    np.testing.assert_allclose(xy[..., 1], ref_y, rtol=1e-5)


def test_project_parallel(rng):
    pc = rng.randn(2, 64, 3).astype(np.float32)
    cam = _paral()
    xy = np.asarray(project_pc2image(pc, cam))
    np.testing.assert_allclose(xy[..., 0], pc[..., 0] + cam.cx, rtol=1e-5)
    np.testing.assert_allclose(xy[..., 1], pc[..., 1] + cam.cy, rtol=1e-5)


def test_ids_roundtrip(rng):
    """parallel2perspect(perspect2parallel(x)) == x (models/utils.py:320-377)."""
    pc = rng.rand(2, 256, 3).astype(np.float32)
    pc[..., 2] = pc[..., 2] * 30 + 1.0  # positive depth
    persp = _persp()
    paral = CameraInfo("parallel", 540 // 32, 960 // 32, None,
                       (960 // 32 - 1) / 2, (540 // 32 - 1) / 2)
    fwd = perspect2parallel(pc, persp, paral)
    back = np.asarray(parallel2perspect(fwd, persp, paral))
    np.testing.assert_allclose(back, pc, rtol=1e-3, atol=1e-4)


def test_ids_log_depth_monotonic(rng):
    pc = np.zeros((1, 8, 3), np.float32)
    pc[..., 2] = np.linspace(1, 35, 8)
    persp = _persp(b=1)
    paral = _paral()
    out = np.asarray(perspect2parallel(pc, persp, paral))
    assert np.all(np.diff(out[0, :, 2]) > 0)
