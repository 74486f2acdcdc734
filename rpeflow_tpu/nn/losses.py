"""Supervised multi-scale 2D / 3D flow losses.

TPU-native equivalents of reference models/losses2d.py:7-37 and
models/losses3d.py:6-38 (the only loss paths exercised by training; the
census/smooth/ssim/chamfer variants upstream are dead code — SURVEY.md §2.4).
Channels-last: flow_2d ``[B, H, W, 2|3]``, flow_3d ``[B, N, 3|4]``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..ops.gather import batch_gather
from ..ops.interp import resize_flow2d


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean of x over elements where mask (matches torch ``x[mask].mean()``)."""
    m = mask.astype(jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * m) / jnp.maximum(jnp.sum(m), 1.0)


def _safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a finite gradient at exactly-zero vectors.

    ``jnp.linalg.norm`` has a NaN gradient at 0 (0/0); a zero diff — e.g. a
    padded region where prediction and target agree exactly — would poison
    every parameter through the loss. sqrt(max(s, 1e-16)) shifts values by
    <= 1e-8 and keeps the gradient zero there.
    """
    s = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(s, 1e-16))


def _level_weights(cfg, n: int) -> Sequence[float]:
    lw = getattr(cfg, "level_weights", None)
    if lw is not None and lw != "None":
        assert n <= len(lw)
        return lw
    decay = cfg.iters_weight_decay
    return [decay ** i for i in range(n)]


def supervised_loss_2d(flows, target, cfg) -> jnp.ndarray:
    """Multi-scale robust-L1 or L2 flow loss (reference losses2d.py:7-37).

    Each prediction is resized (with magnitude rescaling) to the target
    resolution; a 3rd target channel, when present, is a validity mask.
    """
    weights = _level_weights(cfg, len(flows))
    th, tw = target.shape[1:3]
    if target.shape[-1] == 3:
        mask = target[..., 2] > 0
    else:
        mask = jnp.ones(target.shape[:3], bool)
    tgt = target[..., :2].astype(jnp.float32)

    total = 0.0
    for pred, w in zip(flows, weights):
        assert pred.shape[-1] == 2
        diff = jnp.abs(resize_flow2d(pred.astype(jnp.float32), th, tw) - tgt)
        if cfg.order == "l1":
            loss_map = jnp.power(jnp.sum(diff, axis=-1) + 0.01, 0.4)
        elif cfg.order == "l2":
            loss_map = _safe_norm(diff, axis=-1)
        else:
            raise NotImplementedError(cfg.order)
        total = total + w * _masked_mean(loss_map, mask)
    return total


def supervised_loss_3d(flows, target, cfg, indices) -> jnp.ndarray:
    """Multi-scale scene-flow loss (reference losses3d.py:6-38).

    ``indices[i]`` are the pyramid sample indices mapping the full-resolution
    target onto level i's point set; a 4th target channel is a validity mask.
    """
    weights = _level_weights(cfg, len(flows))
    total = 0.0
    for i, (flow, w) in enumerate(zip(flows, weights)):
        if target.shape[1] == flow.shape[1]:
            level_target = target
        else:
            level_target = batch_gather(target, indices[i])
        level_target = level_target.astype(jnp.float32)
        flow = flow.astype(jnp.float32)

        if level_target.shape[-1] == 4:
            mask = level_target[..., 3] > 0
            diff = flow - level_target[..., :3]
            epe_l1 = _masked_mean(
                jnp.power(jnp.sum(jnp.abs(diff), axis=-1) + 0.01, 0.4), mask)
            epe_l2 = _masked_mean(_safe_norm(diff, axis=-1), mask)
        else:
            diff = flow - level_target
            epe_l1 = jnp.mean(jnp.power(jnp.sum(jnp.abs(diff), axis=-1) + 0.01, 0.4))
            epe_l2 = jnp.mean(_safe_norm(diff, axis=-1))

        total = total + w * (epe_l1 if cfg.order == "l1" else epe_l2)
        if cfg.order not in ("l1", "l2"):
            raise NotImplementedError(cfg.order)
    return total
