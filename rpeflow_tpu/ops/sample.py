"""Bilinear sampling / warping in pixel coordinates (align_corners semantics).

TPU-native equivalents of the reference's ``grid_sample``-based helpers
(reference: models/utils.py:172-198, 288-294). The reference normalizes pixel
coordinates to [-1, 1] and calls ``torch.grid_sample(align_corners=True)``;
with that convention normalized coords map straight back to pixel coords, so
we implement bilinear sampling directly in pixel space with gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def mesh_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid ``[H, W, 2]`` with last dim (x, y)."""
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # both [H, W]
    return jnp.stack([xx, yy], axis=-1)


def grid_sample_2d(
    feat: jnp.ndarray, xy: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Bilinear sample of a feature map at continuous pixel coordinates.

    Args:
      feat: ``[B, H, W, C]`` feature map.
      xy: ``[B, ..., 2]`` sample positions in pixel coords, last dim (x, y).
      padding_mode: "zeros" (out-of-range taps contribute 0) or "border"
        (taps clamped to the image border), matching torch ``grid_sample``
        with ``align_corners=True``.

    Returns:
      ``[B, ..., C]`` sampled features.
    """
    assert padding_mode in ("zeros", "border")
    b, h, w, c = feat.shape
    lead = xy.shape[1:-1]
    xy = xy.reshape(b, -1, 2).astype(jnp.float32)  # [B, Q, 2]
    x, y = xy[..., 0], xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        if padding_mode == "border":
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            valid = None
        else:
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = yc * w + xc  # [B, Q]
        v = jnp.take_along_axis(feat.reshape(b, h * w, c), flat[..., None], axis=1)
        if valid is not None:
            v = v * valid[..., None].astype(v.dtype)
        return v

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None].astype(feat.dtype)
    wy = wy[..., None].astype(feat.dtype)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.reshape((b,) + lead + (c,))


def backwarp_2d(feat: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "border") -> jnp.ndarray:
    """Warp ``feat`` backward by ``flow`` (both ``[B, H, W, ·]``).

    Output(y, x) = feat(y + flow_y, x + flow_x), bilinear, align_corners.
    Mirrors reference models/utils.py:186-198.
    """
    b, h, w, _ = feat.shape
    grid = mesh_grid(h, w, dtype=jnp.float32)[None]  # [1, H, W, 2]
    pos = grid + flow.astype(jnp.float32)
    return grid_sample_2d(feat, pos, padding_mode=padding_mode)
