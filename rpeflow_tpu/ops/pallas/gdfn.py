"""Pallas TPU kernel: fused GDFN feed-forward (Restormer gated-dconv FFN).

Computes, in one pass over row tiles with a 1-row halo:

    h  = x @ w_in                      (1x1 conv, C -> 2*hidden, MXU)
    h  = dwconv3x3(h) [+ b_dw]         (depthwise, 9 shifted mults, VPU)
    g  = gelu(h[..., :hidden]) * h[..., hidden:]
    y  = g @ w_out                     (1x1 conv, hidden -> C, MXU)

The XLA lowering of the same chain reads/writes HBM between stages; this
kernel keeps every intermediate in VMEM so HBM traffic is one read of x and
one write of y. Forward-only for now (eval path); the training path keeps
the XLA composition until a custom VJP lands.

Parity/measured numbers: see tests/test_ops_gdfn.py and PERF.md.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _erf(x):
    # Abramowitz-Stegun 7.1.26 rational approximation (max abs err 1.5e-7,
    # i.e. below f32 noise for this op) — Pallas TPU has no erf primitive.
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    # torch nn.gelu(approximate=False): x * 0.5 * (1 + erf(x / sqrt(2)))
    return x * 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _debug_zero() -> bool:
    """RPEFLOW_PALLAS_DEBUG_ZERO=1: kernels store only zeros (same custom-
    call I/O structure, no real compute) — discriminates kernel-compute bugs
    from custom-call graph/buffer-interaction bugs in the in-context NaN
    triage (read at trace time, like the kill switches)."""
    import os

    return os.environ.get("RPEFLOW_PALLAS_DEBUG_ZERO", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _side_effects() -> bool:
    """RPEFLOW_PALLAS_SIDE_EFFECTS=1: mark every Pallas custom call
    side-effecting, forcing XLA to schedule it conservatively (no CSE, no
    reordering across it, pessimistic liveness). Triage knob for the
    in-context corruption that persists even when the kernel stores only
    zeros — if conservative scheduling cures it, the bug is XLA reordering
    or buffer-reuse around the (pure) custom call."""
    import os

    return os.environ.get("RPEFLOW_PALLAS_SIDE_EFFECTS", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _gdfn_kernel(xa_ref, xb_ref, xc_ref, win_ref, wdw_ref, wout_ref, out_ref,
                 *, th, w, c, hidden, debug_zero=False):
    if debug_zero:
        out_ref[0] = jnp.zeros_like(out_ref[0])
        return
    # three consecutive row tiles: previous, current, next (halo = 1 row)
    h2 = 2 * hidden

    def proj(tile):  # [rows, W, C] @ [C, 2H] -> [rows, W, 2H] in f32
        rows = tile.shape[0]
        flat = tile.reshape(rows * w, c)
        return jnp.dot(flat, win_ref[...],
                       preferred_element_type=jnp.float32).reshape(rows, w, h2)

    # rows needed: th + 2 halo rows; build [th+2, W, 2H] hidden slab
    top = proj(xa_ref[0, th - 1:th])        # last row of previous tile
    mid = proj(xb_ref[0])                   # the current tile
    bot = proj(xc_ref[0, 0:1])              # first row of next tile
    slab = jnp.concatenate([top, mid, bot], axis=0)     # [th+2, W, 2H]

    # depthwise 3x3 with zero padding on W (H padding handled by the halo
    # rows, which the caller zeroes at the image border via masking tiles)
    slabp = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((th, w, h2), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + slabp[di:di + th, dj:dj + w, :] * wdw_ref[di, dj]

    g = _gelu_exact(acc[..., :hidden]) * acc[..., hidden:]
    y = jnp.dot(g.reshape(th * w, hidden), wout_ref[...],
                preferred_element_type=jnp.float32)
    # The block's channel count is lane-padded to 128 and ZERO-FILLED: a
    # masked store of just the c logical lanes leaves the buffer's physical
    # lane padding as recycled-allocation garbage, and downstream XLA
    # fusions assume materialized buffers have zero padding (channel-axis
    # reductions / MXU contractions read whole lane tiles). This was the
    # round-2/3 "all-NaN in-context, clean standalone" failure: NaN-stamped
    # reused pages leaked into the next block's LayerNorm mean. Same
    # defense as ops/pallas/correlation.py's zero-filled 128-channel output.
    cp = out_ref.shape[-1]
    out_ref[0] = jnp.pad(y.reshape(th, w, c), ((0, 0), (0, 0), (0, cp - c)))


def _pick_tile(h: int, w: int, c: int, hidden: int) -> int | None:
    """Largest row tile that fits VMEM. Rows are the 3rd-minor axis of the
    [1, th, W, C] blocks — W carries the sublane constraint (w % 8), which
    ``gdfn_pallas`` satisfies by zero-padding W — so th may be any divisor
    of h."""
    w = w + (-w) % 8  # the caller pads W to the sublane multiple
    cp = -(-c // 128) * 128  # the output block is lane-padded to full tiles
    for th in (16, 8, 4, 2, 1):
        if h % th != 0:
            continue
        vmem = 4 * ((th + 2) * w * 2 * hidden * 2   # slab + padded copy
                    + 2 * 3 * th * w * c             # in tiles (double-buffered)
                    + th * w * (hidden + cp))        # gate + padded out
        if vmem < _VMEM_BUDGET:
            return th
    return None


@functools.partial(jax.jit, static_argnums=())
def gdfn_pallas(x: jnp.ndarray, w_in: jnp.ndarray, w_dw: jnp.ndarray,
                w_out: jnp.ndarray) -> jnp.ndarray:
    """Fused GDFN. ``x: [B, H, W, C]``, ``w_in: [C, 2*hidden]``,
    ``w_dw: [3, 3, 2*hidden]``, ``w_out: [hidden, C]`` -> ``[B, H, W, C]``.
    """
    b, h, w_orig, c = x.shape
    h2 = w_in.shape[1]
    hidden = h2 // 2
    assert w_dw.shape == (3, 3, h2) and w_out.shape == (hidden, c)

    # Zero-pad W to the sublane multiple (unaligned coarse levels: 60, 30,
    # 15). Exact: GDFN has no biases, so padded pixels project to exactly
    # the zeros the depthwise conv's zero padding requires; the pad region
    # is sliced off below before it can influence anything else.
    wpad = (-w_orig) % 8
    if wpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    w = w_orig + wpad

    th = _pick_tile(h, w, c, hidden)
    assert th is not None, (h, w, c, hidden)
    n_tiles = h // th

    # zero row-tiles above and below the image so the halo rows at the
    # borders contribute exactly the zero padding the op requires
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (th, th), (0, 0), (0, 0)))

    kernel = functools.partial(_gdfn_kernel, th=th, w=w, c=c, hidden=hidden,
                               debug_zero=_debug_zero())
    tile_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, th, w, c), lambda bi, hi, off=off: (bi, hi + off, 0, 0),
        memory_space=pltpu.VMEM)
    cp = -(-c // 128) * 128  # lane-aligned, zero-filled output (see kernel)
    from . import hbm_out, pin_hbm

    xp, w_in, w_dw, w_out = pin_hbm(xp, w_in.astype(jnp.float32),
                                    w_dw.astype(jnp.float32),
                                    w_out.astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=hbm_out((b, h, w, cp), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            tile_spec(0), tile_spec(1), tile_spec(2),
            pl.BlockSpec((c, h2), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, h2), lambda bi, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cp), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=_side_effects()),
    )(xp, xp, xp, w_in, w_dw, w_out)
    return out[:, :, :w_orig, :c]
