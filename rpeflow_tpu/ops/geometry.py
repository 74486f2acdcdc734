"""Camera projection and the inverse-depth-scaled (IDS) point transforms.

TPU-native equivalents of reference models/utils.py:260-317 (projection,
point->pixel feature scatter) and models/utils.py:320-377 (perspective <->
"parallel" log-depth camera transforms). All point tensors are channels-last
``[B, N, 3]`` and pixel coordinates are ``[B, N, 2]`` with last dim (x, y).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gather import batch_gather
from .sample import grid_sample_2d, mesh_grid


class CameraInfo(NamedTuple):
    """Static-plus-batched camera description.

    ``projection_mode`` is a python string ('perspective' | 'parallel');
    sensor_h/sensor_w are python ints (static); f/cx/cy are ``[B]`` arrays
    (f unused in parallel mode).
    """

    projection_mode: str
    sensor_h: int
    sensor_w: int
    f: jnp.ndarray | None
    cx: jnp.ndarray | float
    cy: jnp.ndarray | float


def _expand(v, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a scalar or [B] camera param against [B, N] points."""
    if isinstance(v, (int, float)):
        return jnp.asarray(v, like.dtype)
    return v.astype(like.dtype)[:, None]


def project_pc2image(pc: jnp.ndarray, camera: CameraInfo) -> jnp.ndarray:
    """Project ``[B, N, 3]`` points to pixel coords ``[B, N, 2]`` (x, y).

    Mirrors reference models/utils.py:260-285.
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    cx = _expand(camera.cx, x)
    cy = _expand(camera.cy, y)
    if camera.projection_mode == "perspective":
        f = _expand(camera.f, x)
        ix = cx + (f / z) * x
        iy = cy + (f / z) * y
    elif camera.projection_mode == "parallel":
        ix = x + cx
        iy = y + cy
    else:
        raise NotImplementedError(camera.projection_mode)
    return jnp.stack([ix, iy], axis=-1)


def perspect2parallel(
    xyz: jnp.ndarray, persp: CameraInfo, paral: CameraInfo
) -> jnp.ndarray:
    """Perspective -> inverse-depth-scaled parallel camera space.

    Mirrors reference models/utils.py:320-346: project to the image plane,
    take log depth (``f * log z + 1``), then rescale to the parallel sensor
    and center it.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    f = _expand(persp.f, x)
    cx = _expand(persp.cx, x)
    cy = _expand(persp.cy, y)

    dx = cx + (f / z) * x
    dy = cy + (f / z) * y
    dz = f * jnp.log(z) + 1.0

    srw = (paral.sensor_w - 1) / (persp.sensor_w - 1)
    srh = (paral.sensor_h - 1) / (persp.sensor_h - 1)
    return jnp.stack(
        [
            dx * srw - (paral.sensor_w - 1) / 2,
            dy * srh - (paral.sensor_h - 1) / 2,
            dz * min(srw, srh),
        ],
        axis=-1,
    )


def parallel2perspect(
    xyz: jnp.ndarray, persp: CameraInfo, paral: CameraInfo
) -> jnp.ndarray:
    """Inverse of :func:`perspect2parallel` (reference models/utils.py:349-377)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    srw = (paral.sensor_w - 1) / (persp.sensor_w - 1)
    srh = (paral.sensor_h - 1) / (persp.sensor_h - 1)

    x = (x + (paral.sensor_w - 1) / 2) / srw
    y = (y + (paral.sensor_h - 1) / 2) / srh
    z = z / min(srw, srh)

    f = _expand(persp.f, x)
    cx = _expand(persp.cx, x)
    cy = _expand(persp.cy, y)

    dz = jnp.exp((z - 1.0) / f)
    dx = (x - cx) * dz / f
    dy = (y - cy) * dz / f
    return jnp.stack([dx, dy, dz], axis=-1)


def project_feat_with_nn_corr(
    xy: jnp.ndarray,
    feat_2d: jnp.ndarray,
    feat_3d: jnp.ndarray,
    nn_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Splat point features onto the pixel grid via nearest-projected-point.

    For every pixel: the offset to its nearest projected point, a correlation
    scalar between the pixel's 2D feature and the 2D feature sampled at that
    point, and the point's 3D feature. Gradients are stopped, matching the
    reference's ``@torch.no_grad`` (models/utils.py:297-317).

    Args:
      xy: ``[B, N, 2]`` projected point coords (pixels).
      feat_2d: ``[B, H, W, C2]``.
      feat_3d: ``[B, N, C3]``.
      nn_indices: ``[B, H*W]`` index of the nearest projected point per pixel.
    Returns:
      ``[B, H, W, 3 + C3]`` with channels (offset_x, offset_y, corr, feat_3d).
    """
    b, h, w, c2 = feat_2d.shape
    xy = jax.lax.stop_gradient(xy)
    feat_2d = jax.lax.stop_gradient(feat_2d)
    feat_3d = jax.lax.stop_gradient(feat_3d)

    grid = mesh_grid(h, w).reshape(1, h * w, 2)  # [1, HW, 2]
    point_feat2d = grid_sample_2d(feat_2d, xy)  # [B, N, C2]
    # one HW-row gather for all three per-point tables (gathers are
    # row-rate-bound — three same-index gathers cost 3x one, PERF.md)
    c3 = feat_3d.shape[-1]
    table = jnp.concatenate(
        [xy, point_feat2d.astype(jnp.float32),
         feat_3d.astype(jnp.float32)], axis=-1)  # [B, N, 2+C2+C3]
    nn = batch_gather(table, nn_indices)  # [B, HW, 2+C2+C3]
    nn_offset = nn[..., :2] - grid
    nn_feat2d = nn[..., 2:2 + c2].astype(feat_2d.dtype)
    nn_feat3d = nn[..., 2 + c2:].astype(feat_3d.dtype)
    nn_corr = jnp.mean(
        nn_feat2d * feat_2d.reshape(b, h * w, c2), axis=-1, keepdims=True
    )  # [B, HW, 1]

    out = jnp.concatenate([nn_offset.astype(feat_2d.dtype), nn_corr, nn_feat3d], axis=-1)
    return out.reshape(b, h, w, 3 + feat_3d.shape[-1])
