"""Variational mutual-information regularizers.

TPU-native equivalents of reference models/mutual_info.py:17-264 — four
loss-only heads (pairwise RGB<->point and three-way RGB<->point<->event, in
2-D and point variants), unified into one module parameterized by the number
of modalities. The reparametrization noise is drawn from a JAX PRNG key
threaded through ``make_rng('mi')`` (the reference hard-codes
``torch.cuda.FloatTensor`` sampling, mutual_info.py:32).

These heads only contribute to the loss — their latents never feed forward
features (reference RPEFlow_core.py:34-36) — so call sites skip them entirely
at eval time.

Numerical notes for loss parity with torch:
  * L2-normalization uses eps=1e-6 *inside* the sqrt.
  * The Normal used for the KL has scale = exp(logvar) (not exp(logvar/2)),
    while reparametrization uses std = exp(logvar/2), exactly as upstream.
  * ``Independent(..., 1)`` sums the KL over torch's *last* axis (W or N) and
    means over the rest; layout-independent form: sum_all / (numel / last).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvNormAct


def _l2norm_feat(x: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-6)
    return x / n


def _bce(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch binary_cross_entropy with mean reduction and -100 log clamp."""
    log_x = jnp.maximum(jnp.log(x), -100.0)
    log_1mx = jnp.maximum(jnp.log1p(-x), -100.0)
    return -jnp.mean(target * log_x + (1.0 - target) * log_1mx)


def _kl_normal(mu1, lv1, mu2, lv2) -> jnp.ndarray:
    """Elementwise KL(N(mu1, e^lv1) || N(mu2, e^lv2)); scales are exp(logvar)."""
    s1, s2 = jnp.exp(lv1), jnp.exp(lv2)
    return lv2 - lv1 + (s1 ** 2 + (mu1 - mu2) ** 2) / (2.0 * s2 ** 2) - 0.5


class MutualInfoReg(nn.Module):
    """Pairwise or three-way variational MI loss.

    ``n_modalities=2`` mirrors Mutual_info_reg_2D/_3D; ``n_modalities=3``
    mirrors the _Event variants. Input rank (4-D image vs 3-D points) decides
    the 2-D vs point form automatically.
    """

    hidden_channels: int
    n_modalities: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, *feats: jnp.ndarray) -> jnp.ndarray:
        assert len(feats) == self.n_modalities
        prefixes = ["rgb", "point", "event"][: self.n_modalities]

        # torch's "last dim" for the Independent(...,1) sum: W for [B,C,H,W]
        # inputs (ours [B,H,W,C] -> shape[2]), N for [B,C,N] (ours [B,N,C]
        # -> shape[1]).
        x0 = feats[0]
        torch_last = x0.shape[2] if x0.ndim == 4 else x0.shape[1]
        # reference divides the final loss by H*W (2-D) or N (points)
        denom = (x0.shape[1] * x0.shape[2]) if x0.ndim == 4 else x0.shape[1]

        mus, lvs, zs = [], [], []
        for prefix, feat in zip(prefixes, feats):
            feat = _l2norm_feat(feat)
            mu = ConvNormAct(self.hidden_channels, activation=None,
                             dtype=self.dtype, name=f"{prefix}_mu")(feat)
            lv = ConvNormAct(self.hidden_channels, activation=None,
                             dtype=self.dtype, name=f"{prefix}_logvar")(feat)
            mu = jnp.tanh(mu.astype(jnp.float32))
            lv = jnp.tanh(lv.astype(jnp.float32))
            eps = jax.random.normal(self.make_rng("mi"), mu.shape, jnp.float32)
            z = eps * jnp.exp(0.5 * lv) + mu
            mus.append(mu)
            lvs.append(lv)
            zs.append(jax.nn.sigmoid(z))

        ce = 0.0
        kld = 0.0
        pairs = [(0, 1)] if self.n_modalities == 2 else [(0, 1), (0, 2), (1, 2)]
        for i, j in pairs:
            ce = ce + _bce(zs[i], jax.lax.stop_gradient(zs[j]))
            ce = ce + _bce(zs[j], jax.lax.stop_gradient(zs[i]))
            kl_ij = jnp.sum(_kl_normal(mus[i], lvs[i], mus[j], lvs[j]))
            kl_ji = jnp.sum(_kl_normal(mus[j], lvs[j], mus[i], lvs[i]))
            numel = math.prod(mus[i].shape)
            kld = kld + (kl_ij + kl_ji) / (numel / torch_last)

        return (ce - kld) / denom
