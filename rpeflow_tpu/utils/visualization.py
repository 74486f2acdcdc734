"""Flow / event visualization (host-side numpy).

Mirrors the visualization half of reference utils.py:266-402 (Middlebury
color-wheel optical-flow rendering) and event_utils.py:306-448 (event-voxel
previews): the standard Baker et al. color wheel with 55 hue bins.
"""

from __future__ import annotations

import numpy as np


def make_colorwheel() -> np.ndarray:
    """Standard 55-entry Middlebury color wheel, [55, 3] uint8-range floats."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_image(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """Render ``[H, W, 2]`` optical flow as an RGB uint8 image."""
    flow = np.nan_to_num(np.asarray(flow, np.float32), nan=0.0,
                         posinf=0.0, neginf=0.0)
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    if max_flow is None:
        max_flow = max(np.max(rad), 1e-5)
    u = u / max_flow
    v = v / max_flow
    rad = np.sqrt(u ** 2 + v ** 2)

    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    angle = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    fk = (angle + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255 * col)
    return img


def scene_flow_to_image(flow_3d: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """Render per-point scene flow ``[N, 3]`` as RGB colors ``[N, 3]`` uint8.

    Each axis is mapped to a channel around gray, like the reference's
    3D-flow visualizations.
    """
    if max_flow is None:
        max_flow = max(float(np.abs(flow_3d).max()), 1e-5)
    norm = np.clip(flow_3d / max_flow, -1, 1)
    return ((norm * 0.5 + 0.5) * 255).astype(np.uint8)


def event_voxel_to_image(event_voxel: np.ndarray) -> np.ndarray:
    """Render an event voxel ``[H, W, C]`` as an RGB preview.

    Positive accumulation -> red, negative -> blue (event_utils.py:306-448
    renders the same polarity split).
    """
    half = event_voxel.shape[-1] // 2
    if half > 0:
        pos = event_voxel[..., :half].sum(-1)
        neg = event_voxel[..., half:].sum(-1)
        signed = pos - neg
    else:
        signed = event_voxel.sum(-1)
    mx = max(float(np.abs(signed).max()), 1e-5)
    signed = signed / mx
    img = np.full(signed.shape + (3,), 255, np.uint8)
    img[..., 1] = (255 * (1 - np.abs(signed))).astype(np.uint8)
    img[..., 0] = np.where(signed < 0, (255 * (1 - np.abs(signed))), 255).astype(np.uint8)
    img[..., 2] = np.where(signed > 0, (255 * (1 - np.abs(signed))), 255).astype(np.uint8)
    return img
