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

    # TPU gathers are row-rate-bound (~7-9 ns/row regardless of width,
    # PERF.md): four per-corner gathers cost 4x one. For border mode with
    # many queries (backwarp_2d: Q == H*W every decode level) pack the 2x2
    # corner neighborhood of every pixel into one 4C-wide row via two rolls
    # (aligned dims, one streaming pass) and fetch once.
    #
    # Correctness: coordinates are clamped to [0, w-1]x[0, h-1] first —
    # bilinear with per-tap clamping is exactly equivalent (outside the
    # image both contributing taps collapse to the border pixel and the
    # weights sum to 1). After clamping, a wrapped-around corner from the
    # roll can only be touched with weight exactly 0 (x0 == w-1 implies
    # wx == 0), and 0 * finite == 0.
    #
    # Zeros mode keeps per-corner gathers: its callers sample few points
    # (Q = N << H*W), where 3 saved Q-row fetches don't pay for streaming
    # a 4C-wide table over the whole map (measured regression, PERF.md).
    use_quad = padding_mode == "border"
    if use_quad:
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    if use_quad:
        fr = jnp.roll(feat, -1, axis=2)   # x+1 corners
        fd = jnp.roll(feat, -1, axis=1)   # y+1 corners
        fdr = jnp.roll(fd, -1, axis=2)
        quad = jnp.concatenate([feat, fr, fd, fdr], axis=-1
                               ).reshape(b, h * w, 4 * c)
        xc = x0.astype(jnp.int32)
        yc = y0.astype(jnp.int32)
        # coords are clamped above, so the flat index is always in bounds
        # (default mode would append a clamping select pass over 4C rows)
        v = jnp.take_along_axis(quad, (yc * w + xc)[..., None], axis=1,
                                mode="promise_in_bounds")
        v00, v01, v10, v11 = (v[..., :c], v[..., c:2 * c],
                              v[..., 2 * c:3 * c], v[..., 3 * c:])
    else:
        def tap(xi, yi):
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            flat = yc * w + xc  # [B, Q]
            v = jnp.take_along_axis(
                feat.reshape(b, h * w, c), flat[..., None], axis=1,
                mode="promise_in_bounds")  # xc/yc clipped above
            # zero out-of-range taps; validity comes from the ORIGINAL
            # coordinates (weights stay unclamped, matching torch)
            return v * valid[..., None].astype(v.dtype)

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
