"""Pallas TPU kernel: single-pass depthwise 3x3 convolution.

Why this exists: the model's depthwise convs (MDTA qkv and GDFN, reference
restormer_arch.py:88-108,169-204) cannot use XLA's conv lowerings on the
current server toolchain — both the grouped form (feature_group_count=C)
and the dense taps-on-eye regular conv are loci of a context-dependent
miscompile that emits NaN from finite inputs at the flagship shape
(PERF.md "Round-3 root-cause chain"). The safe fallback, the flat
shift-multiply tap sum (nn/mdta.py:_dw_flat), is correct but XLA
materializes its tap-accumulation passes: a round-3 profile attributes
4.41 ms to ONE level-1 GDFN dwconv whose single-pass roofline (read the
map once, write it once at 819 GB/s) is ~0.5 ms, and the flat/dw bucket
totals ~35-50 ms of the 215.9 ms forward.

This kernel streams the input through VMEM row tiles with a one-row halo
(same decomposition as the proven-in-context correlation kernel and the
gdfn kernel, ops/pallas/{correlation,gdfn}.py) and accumulates all nine
taps in VMEM. HBM traffic is ~3 reads of x plus one write of y — each row
tile is DMA'd up to three times, as the prev/cur/next operand of adjacent
grid steps — still ~3x fewer passes than XLA's materialized 9-tap
accumulation of the flat form.

Output padding: the lane-padded CHANNELS of the output are exactly zero
(the padded channels carry zero taps). The sublane-padded W columns are
NOT zero — they receive the last real column's tap contributions — which
is harmless because both pads are explicit array extents sliced off on
return (jnp.pad grows the logical shape; this is not physical tile
padding, so the round-2/3 stale-padding NaN class does not apply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _dw_kernel(xa_ref, xb_ref, xc_ref, taps_ref, out_ref, *, th, w, cb):
    # three consecutive row tiles: previous, current, next (halo = 1 row)
    top = xa_ref[0, th - 1:th]
    mid = xb_ref[0]
    bot = xc_ref[0, 0:1]
    slab = jnp.concatenate([top, mid, bot], axis=0)      # [th+2, W, cb]
    slabp = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))      # zero W padding
    acc = jnp.zeros((th, w, cb), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + slabp[di:di + th, dj:dj + w, :] * taps_ref[di, dj]
    out_ref[0] = acc


def _divisors_desc(n: int, cap: int):
    return [d for d in range(min(n, cap), 0, -1) if n % d == 0]


def _pick_tile(h: int, w: int, cp: int) -> tuple[int, int] | None:
    """Largest (row tile, channel block) fitting the VMEM budget.

    ``w`` is already sublane-padded (multiple of 8) and ``cp`` lane-padded
    (multiple of 128) by the caller; the channel block must divide cp.
    """
    for th in _divisors_desc(h, 16):
        for cb in (1024, 512, 256, 128):
            if cp % cb != 0:
                continue
            # 3 double-buffered input tiles + slab + padded slab + acc + out
            vmem = 4 * (2 * 3 * th * w * cb
                        + (th + 2) * w * cb
                        + (th + 2) * (w + 2) * cb
                        + 2 * th * w * cb)
            if vmem < _VMEM_BUDGET:
                return th, cb
    return None


def dwconv_ok(shape) -> bool:
    """Can dwconv_pallas handle this [B, H, W, C] input?"""
    _, h, w, c = shape
    wp = w + (-w) % 8
    cp = -(-c // 128) * 128
    return _pick_tile(h, wp, cp) is not None


@functools.partial(jax.jit, static_argnums=())
def dwconv_pallas(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 conv, zero padding. ``x: [B, H, W, C]``,
    ``taps: [3, 3, C]`` -> ``[B, H, W, C]`` (float32, bias-free — callers
    add bias as a fused elementwise epilogue)."""
    b, h, w_orig, c = x.shape
    assert taps.shape == (3, 3, c), (taps.shape, c)

    # Sublane-pad W and lane-pad C with ZEROS (zero taps on padded
    # channels keep the padded output lanes exactly zero; the padded
    # columns only feed the last real column's right-neighbor tap, which
    # the op's zero padding requires to be zero anyway). Both pads are
    # sliced off on return.
    wpad = (-w_orig) % 8
    cpad = (-c) % 128
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, wpad), (0, cpad)))
    tp = jnp.pad(taps.astype(jnp.float32), ((0, 0), (0, 0), (0, cpad)))
    w = w_orig + wpad
    cp = c + cpad

    tile = _pick_tile(h, w, cp)
    assert tile is not None, (h, w, cp)
    th, cb = tile
    n_tiles = h // th

    # zero row-tiles above and below the image: the halo rows at the
    # borders then contribute exactly the zero padding the op requires
    xp = jnp.pad(xp, ((0, 0), (th, th), (0, 0), (0, 0)))

    kernel = functools.partial(_dw_kernel, th=th, w=w, cb=cb)
    tile_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, th, w, cb), lambda bi, hi, ci, off=off: (bi, hi + off, 0, ci),
        memory_space=pltpu.VMEM)
    from . import hbm_out, pin_hbm

    xp, tp = pin_hbm(xp, tp)
    out = pl.pallas_call(
        kernel,
        out_shape=hbm_out((b, h, w, cp), jnp.float32),
        grid=(b, n_tiles, cp // cb),
        in_specs=[
            tile_spec(0), tile_spec(1), tile_spec(2),
            pl.BlockSpec((3, 3, cb), lambda bi, hi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cb),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
    )(xp, xp, xp, tp)
    return out[:, :, :w_orig, :c]
