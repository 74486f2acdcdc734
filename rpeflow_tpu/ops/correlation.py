"""All-pairs local 2D cost volume (correlation).

TPU-native equivalent of the reference CUDA op (reference:
models/csrc/correlation/correlation_forward_kernel.cu:11-55,
correlation_backward_kernel.cu:4-89, torch fallback wrapper.py:56-65).

For every pixel, the mean over channels of ``f1(y, x) . f2(y+dy, x+dx)`` for
all displacements ``|dy|,|dx| <= d`` (zero padding outside), giving a
``(2d+1)^2``-channel output, channel index ``(dy+d) * (2d+1) + (dx+d)``.

Two implementations:
  * ``correlation2d_ref``: pure-jnp shifted-multiply formulation (the unrolled
    loop of 81 fused multiply+channel-mean passes). Used as the parity oracle
    and as the fallback off-TPU.
  * ``correlation2d``: Pallas TPU kernel (see pallas/correlation.py) that
    keeps both feature maps resident in VMEM and emits all displacement
    channels in one pass — ~81x less HBM traffic than the shifted-multiply
    formulation. Falls back to the jnp version on non-TPU backends.

Both are differentiable; the Pallas path provides a custom VJP whose backward
is expressed with the same shift algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _shifted(f2p: jnp.ndarray, i: int, j: int, h: int, w: int) -> jnp.ndarray:
    return lax.dynamic_slice_in_dim(lax.dynamic_slice_in_dim(f2p, i, h, 1), j, w, 2)


@functools.partial(jax.jit, static_argnums=(2,))
def correlation2d_ref(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int) -> jnp.ndarray:
    """Pure-XLA cost volume. ``f1, f2: [B, H, W, C]`` -> ``[B, H, W, (2d+1)^2]``."""
    assert f1.shape == f2.shape and f1.ndim == 4
    d = max_displacement
    _, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            prod = f1 * _shifted(f2p, i, j, h, w)
            outs.append(jnp.mean(prod, axis=-1))
    return jnp.stack(outs, axis=-1)


def _correlation2d_bwd_ref(f1, f2, g, max_displacement):
    """Backward of the cost volume wrt both inputs, in pure shift algebra.

    d corr[., ch(i,j)] / d f1 = shifted(f2, i, j) / C and
    grad_f2(y, x) = sum_ij q_ij(y + d - i, x + d - j) with q_ij = g_ij * f1 / C
    (zero outside the frame) — expressed as slices of a d-padded product, so
    no read-modify-write dynamic updates are needed.
    """
    d = max_displacement
    b, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    grad1 = jnp.zeros_like(f1)
    grad2 = jnp.zeros_like(f2)
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            gc = g[..., i * (2 * d + 1) + j][..., None] / c  # [B,H,W,1]
            grad1 = grad1 + gc * _shifted(f2p, i, j, h, w)
            qp = jnp.pad(gc * f1, ((0, 0), (d, d), (d, d), (0, 0)))
            grad2 = grad2 + _shifted(qp, 2 * d - i, 2 * d - j, h, w)
    return grad1, grad2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlation2d(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int) -> jnp.ndarray:
    """Cost volume with a TPU Pallas fast path. ``[B,H,W,C] -> [B,H,W,(2d+1)^2]``."""
    return _correlation2d_impl(f1, f2, max_displacement)


def _correlation2d_impl(f1, f2, max_displacement):
    import os

    # In-context profiling shows the XLA shifted-multiply path pays a large
    # 81-plane relayout concatenate (7.6 ms at the finest level) on top of
    # the shift fusions; the Pallas kernel emits the packed cost volume
    # directly. Default to Pallas on TPU.
    impl = os.environ.get("RPEFLOW_CORR_IMPL", "auto")
    from .pallas import pallas_enabled

    if impl == "auto" and not pallas_enabled("corr"):
        impl = "xla"
    if impl != "xla":
        from .pallas.correlation import correlation2d_pallas, pallas_supported

        # tiny maps (coarse pyramid levels) run faster in plain XLA; the
        # Pallas grid/padding overhead only pays off at >= ~2k pixels
        big_enough = f1.shape[1] * f1.shape[2] >= 2048
        if impl == "pallas" or (pallas_supported(f1) and big_enough):
            from .pallas import maybe_barrier

            f1, f2 = maybe_barrier((f1, f2))
            return maybe_barrier(
                correlation2d_pallas(f1, f2, max_displacement))
    return correlation2d_ref(f1, f2, max_displacement)


def _corr_fwd(f1, f2, max_displacement):
    return _correlation2d_impl(f1, f2, max_displacement), (f1, f2)


def _corr_bwd(max_displacement, res, g):
    f1, f2 = res
    return _correlation2d_bwd_ref(f1, f2, g, max_displacement)


correlation2d.defvjp(_corr_fwd, _corr_bwd)
