"""Resizing and interpolation with torch ``align_corners=True`` semantics.

Covers the reference's ``interpolate(..., mode='bilinear', align_corners=True)``
call sites (models/utils.py:217-241, RPEFlow_core.py:349-350, 427), the
inverse-distance KNN upsampler (models/utils.py:140-156), the 3D backwarp
(models/utils.py:159-169) and RAFT convex upsampling (models/utils.py:201-214).

Since all shapes are static under jit, interpolation taps/weights are computed
with numpy at trace time and baked into the graph as constants.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .gather import batch_gather, batch_gather_xyz_feat
from .knn import k_nearest_neighbor


def _ac_taps(n_in: int, n_out: int):
    """1-D align_corners source taps and weights: (i0, i1, w1) as numpy."""
    if n_out == 1:
        src = np.zeros((1,), np.float64)
    else:
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


def resize_bilinear_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True. ``[B, H, W, C] -> [B, out_h, out_w, C]``."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dt = x.dtype
    i0, i1, wy = _ac_taps(h, out_h)
    x = x[:, i0] * (1.0 - wy[None, :, None, None]).astype(dt) + x[:, i1] * wy[None, :, None, None].astype(dt)
    j0, j1, wx = _ac_taps(w, out_w)
    x = x[:, :, j0] * (1.0 - wx[None, None, :, None]).astype(dt) + x[:, :, j1] * wx[None, None, :, None].astype(dt)
    return x


def resize_flow2d(flow: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Resize a 2D flow field and rescale its magnitudes accordingly.

    Mirrors reference models/utils.py:217-224. ``flow: [B, H, W, 2]``.
    """
    h, w = flow.shape[1:3]
    if (h, w) == (target_h, target_w):
        return flow
    flow = resize_bilinear_ac(flow, target_h, target_w)
    scale = jnp.array([target_w / w, target_h / h], flow.dtype)
    return flow * scale


def resize_to_64x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resize ``[B, H, W, C]`` so H and W are multiples of 64.

    Mirrors reference models/utils.py:227-241 (inputs only; flow targets keep
    their native resolution as in the reference train path).
    """
    h, w = x.shape[1:3]
    h64, w64 = -(-h // 64) * 64, -(-w // 64) * 64
    if (h64, w64) == (h, w):
        return x
    return resize_bilinear_ac(x, h64, w64)


def pad_to_64x(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad ``[B, H, W, C]`` at bottom/right so H, W are multiples of 64."""
    h, w = x.shape[1:3]
    ph, pw = (-h) % 64, (-w) % 64
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def knn_interpolation(
    input_xyz: jnp.ndarray,
    input_features: jnp.ndarray,
    query_xyz: jnp.ndarray,
    k: int = 3,
) -> jnp.ndarray:
    """Inverse-distance-weighted k-NN feature interpolation.

    Mirrors reference models/utils.py:140-156 (channels-last here).

    Args:
      input_xyz: ``[B, N, 3]``; input_features: ``[B, N, C]``;
      query_xyz: ``[B, Q, 3]``.
    Returns:
      ``[B, Q, C]``.
    """
    knn_idx = k_nearest_neighbor(input_xyz, query_xyz, k)  # [B, Q, k]
    # fused [xyz|feat] row fetch — gathers are row-rate-bound (PERF.md)
    knn_xyz, knn_feats = batch_gather_xyz_feat(
        input_xyz, input_features, knn_idx)
    # NaN-safe distance: queries routinely coincide exactly with inputs (the
    # pyramid levels are FPS prefixes of each other), and sqrt has an
    # undefined gradient at 0 — clamp INSIDE the sqrt. sqrt(1e-16) == the
    # reference's 1e-8 distance clamp (models/utils.py:150), so values match.
    diff = (knn_xyz - query_xyz[:, :, None, :]).astype(jnp.float32)
    dists = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-16))
    weights = 1.0 / dists
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)  # [B, Q, k]
    return jnp.sum(knn_feats * weights[..., None].astype(knn_feats.dtype), axis=2)


def backwarp_3d(
    xyz1: jnp.ndarray, xyz2: jnp.ndarray, flow12: jnp.ndarray, k: int = 3
) -> jnp.ndarray:
    """Warp ``xyz2`` backward through ``flow12`` living on ``xyz1``.

    Mirrors reference models/utils.py:159-169: forward-warp xyz1, interpolate
    the reversed flow onto xyz2, apply. All ``[B, N, 3]``.
    """
    xyz1_warp = xyz1 + flow12
    flow21 = knn_interpolation(xyz1_warp, -flow12, query_xyz=xyz2, k=k)
    return xyz2 + flow21


def _depth_to_space_kernel(s: int, c: int) -> np.ndarray:
    """One-hot conv_transpose kernel performing depth-to-space.

    Maps input channel ``(p * s + q) * c + ch`` to output subpixel ``(p, q)``
    channel ``ch``. The spatial flip accounts for conv_transpose's mirrored
    kernel indexing.
    """
    k = np.zeros((s, s, s * s * c, c), np.float32)
    for p in range(s):
        for q in range(s):
            for ch in range(c):
                k[s - 1 - p, s - 1 - q, (p * s + q) * c + ch, ch] = 1.0
    return k


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, scale_factor: int = 4,
                    use_d2s_conv: bool | None = None) -> jnp.ndarray:
    """RAFT-style convex-combination upsampling.

    Mirrors reference models/utils.py:201-214 in channels-last layout.

    TPU formulation: the textbook einsum + 6-D transpose materializes
    ``[B,H,W,s,s,2]`` tensors whose (s,2) trailing dims pad to (8,128) — a
    64x physical blowup costing ~17 ms at the FT3D eval shape. Instead the
    convex combination lands in a flat ``[B,H,W,s*s*2]`` tensor and the
    subpixel interleave is one stride-s conv_transpose with a one-hot
    kernel — depth-to-space on the MXU with clean layouts.

    Formulation notes (all measured):
      * accumulate via einsum, NOT via 9 repeat/tile (or outer-product)
        elementwise terms — XLA:CPU under GSPMD takes 46 s (repeat/tile) /
        280 s (outer) to compile those chains vs 0.95 s for the einsum;
      * d2s via conv_transpose on TPU only — XLA:CPU hangs compiling the
        strided conv_transpose under GSPMD; CPU/GPU take the exact
        reshape+transpose path (cheap there);
      * on TPU both the einsum and the one-hot conv run on the bf16 MXU
        (<=0.2% relative, the same error class as the einsum+transpose
        formulation this replaces); the CPU path is f32-exact.

    Args:
      flow: ``[B, H, W, 2]`` coarse flow.
      mask: ``[B, H, W, 9 * s * s]`` logits from the upsample-mask head, with
        channel index laid out as (neighbor, sub_y, sub_x) — outermost first —
        to match the torch head's channel order.
      scale_factor: s.
      use_d2s_conv: force the conv_transpose depth-to-space finish (None =
        TPU only). Exposed so the CPU test suite can assert parity of the
        TPU formulation against the exact reshape path.
    Returns:
      ``[B, H*s, W*s, 2]``.
    """
    b, h, w, _ = flow.shape
    s = scale_factor
    m = mask.reshape(b, h, w, 9, s * s).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)

    fp = jnp.pad(flow.astype(jnp.float32) * s, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack(
        [fp[:, di:di + h, dj:dj + w, :] for di in range(3) for dj in range(3)],
        axis=3,
    )  # [B, H, W, 9, 2]
    acc = jnp.einsum("bhwnk,bhwnc->bhwkc", m, nbrs).reshape(b, h, w, s * s * 2)

    if use_d2s_conv is None:
        use_d2s_conv = jax.default_backend() == "tpu"
    if use_d2s_conv:
        kern = jnp.asarray(_depth_to_space_kernel(s, 2))
        return jax.lax.conv_transpose(
            acc, kern, strides=(s, s), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    acc = acc.reshape(b, h, w, s, s, 2).transpose(0, 1, 3, 2, 4, 5)
    return acc.reshape(b, h * s, w * s, 2)
