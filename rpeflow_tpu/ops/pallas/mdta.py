"""Pallas TPU kernel: fused MDTA cross-attention front half.

The Restormer MDTA block (reference models/restormer_arch.py:169-222)
computes, per token map:

    xn = LN_c(x); yn = LN_c(y)                    (channel LayerNorm)
    q  = dw3x3(xn; wq); k = dw3x3(yn; wk); v = dw3x3(yn; wv)
    q^ = l2norm_T(q); k^ = l2norm_T(k)            (normalize over TOKENS)
    attn = softmax(q^T k^ * temperature)          (C x C, per head)
    out  = (attn @ v) @ w_out                     (1x1 projection)

Two structural facts make this fusable with ONE pass over the map plus one
clean matmul:

1. The token-axis l2 normalization folds into the accumulated Gram matrix:
   (q^T k^)[c,d] == (q^T k)[c,d] / (||q_c|| * ||k_d||), so the kernel only
   accumulates raw q^T k and the per-channel sums of squares.
2. ``attn @ v`` followed by the 1x1 projection is one matmul with the
   precomputed matrix M = blockdiag_h(attn_h^T) @ w_out, i.e.
   out = v @ M — XLA handles that perfectly; no second kernel needed.

So the kernel below streams row tiles of x and y once, does LN + the three
depthwise convs in VMEM, writes v, and accumulates [C,C] q^T k plus [2,C]
sums of squares across the grid. HBM traffic: read x,y once, write v once,
plus O(C^2) accumulators — versus the XLA chain's ~10 map-sized
materializations (2 LN maps, 3C concat, 3C conv output, 2 normalized maps,
attention out). The [B,N,C] point variant maps to H=1 with a k=3 1-D conv.

Backward stays on the XLA composition via custom VJP (see nn/mdta.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _mdta_kernel(xa_ref, xb_ref, xc_ref, ya_ref, yb_ref, yc_ref,
                 ln_ref, dw_ref, v_ref, qk_ref, sq_ref,
                 *, th, w, w_orig, c, kh, n_tiles, debug_zero=False):
    if debug_zero:  # see ops/pallas/gdfn.py:_debug_zero
        v_ref[0] = jnp.zeros_like(v_ref[0])
        qk_ref[0] = jnp.zeros_like(qk_ref[0])
        sq_ref[0] = jnp.zeros_like(sq_ref[0])
        return
    """One (batch, row-tile) grid step.

    Inputs (VMEM blocks):
      xa/xb/xc: previous/current/next [1, th, W, C] row tiles of x (same for
                y) — the +-1-row halo for the 3x3 depthwise conv, GDFN style.
      ln_ref:   [4, C]  rows = (lnx_w, lnx_b, lny_w, lny_b)
      dw_ref:   [kh, 3, 3C] depthwise taps, channel order (q | k | v)
    Outputs:
      v_ref:    [1, th, W, C] value tile
      qk_ref:   [1, C, C]  accumulated q^T k      (init at tile 0)
      sq_ref:   [1, 2, C]  accumulated sum-of-squares rows (q; k)
    """
    hi = pl.program_id(1)
    halo = kh // 2  # 1 for the 2-D 3x3 conv, 0 for the 1-D point conv

    def build_slab(a_ref, b_ref, c_ref):
        if halo:
            return jnp.concatenate(
                [a_ref[0, th - 1:th], b_ref[0], c_ref[0, 0:1]], axis=0)
        return b_ref[0]

    def layer_norm(slab, wrow, brow):
        xf = slab.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
        # [1, C] slices (Mosaic prefers >=2-D vector loads)
        return ((xf - mu) / jnp.sqrt(var + 1e-5) * ln_ref[wrow:wrow + 1, :]
                + ln_ref[brow:brow + 1, :])

    rows = th + 2 * halo
    # validity mask: the halo rows beyond the image border and the zero-pad
    # columns (W padded to the sublane multiple) must contribute the CONV's
    # zero padding — but LN(0) == ln_bias != 0, so zero them after LN.
    # (Arithmetic form only: Mosaic cannot legalize scalar-conditioned
    # selects like jnp.where(hi == 0, ...).)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (rows, w, 1), 1) < w_orig
    if halo:
        # slab row r is image row hi*th + r - halo; valid iff in [0, H)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, w, 1), 0)
        img_row = hi * th + ridx - halo
        row_ok = (img_row >= 0) & (img_row < n_tiles * th)
        mask = (row_ok & col_ok).astype(jnp.float32)
    else:
        mask = col_ok.astype(jnp.float32)

    xs = layer_norm(build_slab(xa_ref, xb_ref, xc_ref), 0, 1) * mask
    ys = layer_norm(build_slab(ya_ref, yb_ref, yc_ref), 2, 3) * mask

    def dwconv(slab, ch0):
        # [rows, W, C] -> [th, W, C]; taps dw_ref[di, dj, ch0:ch0+c]
        sp = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((th, w, c), jnp.float32)
        for di in range(kh):
            for dj in range(3):
                acc = acc + (sp[di:di + th, dj:dj + w, :]
                             * dw_ref[di, dj:dj + 1, ch0:ch0 + c])
        return acc

    q = dwconv(xs, 0)
    k = dwconv(ys, c)
    v = dwconv(ys, 2 * c)
    # All three outputs are lane/sublane-padded to full tiles and
    # ZERO-FILLED: a masked store of just the logical lanes leaves the
    # buffer's physical padding as recycled-allocation garbage, and
    # downstream XLA fusions assume materialized buffers have zero padding
    # (v is contracted over channels by the projection matmul; qk/sq feed
    # channel-axis math). This was the round-2/3 "all-NaN in-context,
    # clean standalone" failure class — same defense as
    # ops/pallas/correlation.py's zero-filled 128-channel output.
    cp = v_ref.shape[-1]
    v_ref[0] = jnp.pad(v, ((0, 0), (0, 0), (0, cp - c)))

    # post-conv column mask: the conv writes real data into the first padded
    # column (its dj=0 tap reads column w_orig-1), which must not enter the
    # token reductions
    mask_out = mask[halo:halo + th]
    qm = q * mask_out
    km = k * mask_out

    qf = qm.reshape(th * w, c)
    kf = km.reshape(th * w, c)
    qk = jax.lax.dot_general(qf, kf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sq = jnp.concatenate([jnp.sum(qf * qf, axis=0, keepdims=True),
                          jnp.sum(kf * kf, axis=0, keepdims=True)], axis=0)
    cs, cp = qk_ref.shape[-2:]  # sublane/lane-padded block extents
    qk = jnp.pad(qk, ((0, cs - c), (0, cp - c)))
    sq = jnp.pad(sq, ((0, sq_ref.shape[-2] - 2), (0, cp - c)))

    @pl.when(hi == 0)
    def _init():
        qk_ref[0] = qk
        sq_ref[0] = sq

    @pl.when(hi != 0)
    def _acc():
        qk_ref[0] += qk
        sq_ref[0] += sq


def _pick_tile(h: int, w: int, c: int, kh: int) -> int | None:
    """Largest row tile that fits VMEM (w already sublane-padded)."""
    cp = -(-c // 128) * 128  # outputs are lane-padded to full tiles
    for th in (16, 8, 4, 2, 1):
        if h % th != 0:
            continue
        rows = th + 2 * (kh // 2)
        vmem = 4 * (2 * 6 * th * w * c        # 6 in tiles, double-buffered
                    + 2 * rows * (w + 2) * c  # LN'd slabs (+ padded copies)
                    + 2 * th * w * c          # q, k
                    + th * w * cp             # v (padded out block)
                    + cp * cp + 8 * cp)
        if vmem < _VMEM_BUDGET:
            return th
    return None


@functools.partial(jax.jit, static_argnames=("kh",))
def mdta_qkv_pallas(x: jnp.ndarray, y: jnp.ndarray, ln: jnp.ndarray,
                    dw: jnp.ndarray, kh: int = 3):
    """Fused LN + depthwise-qkv + attention accumulation.

    Args:
      x, y: ``[B, H, W, C]`` (point maps enter as ``[B, 1, N, C]``).
      ln:   ``[4, C]`` rows (lnx_weight, lnx_bias, lny_weight, lny_bias).
      dw:   ``[kh, 3, 3C]`` depthwise taps in (q | k | v) channel order.
      kh:   3 for the 2-D 3x3 conv, 1 for the point variant's 1-D k=3 conv.

    Returns ``(v [B,H,W,C] f32, qk [B,C,C] f32, sq [B,2,C] f32)`` where
    ``qk = sum_t q_t k_t^T`` and ``sq`` rows are per-channel sums of squares
    of q and k over tokens.
    """
    b, h, w_orig, c = x.shape
    assert y.shape == x.shape and ln.shape == (4, c)
    assert dw.shape == (kh, 3, 3 * c), (dw.shape, kh, c)

    wpad = (-w_orig) % 8
    if wpad:
        pads = ((0, 0), (0, 0), (0, wpad), (0, 0))
        x = jnp.pad(x, pads)
        y = jnp.pad(y, pads)
    w = w_orig + wpad

    th = _pick_tile(h, w, c, kh)
    assert th is not None, (h, w, c)
    n_tiles = h // th

    halo = kh // 2
    if halo:
        hp = ((0, 0), (th, th), (0, 0), (0, 0))
        xp = jnp.pad(x.astype(jnp.float32), hp)
        yp = jnp.pad(y.astype(jnp.float32), hp)
    else:
        xp = x.astype(jnp.float32)
        yp = y.astype(jnp.float32)

    from .gdfn import _debug_zero, _side_effects

    kernel = functools.partial(_mdta_kernel, th=th, w=w, w_orig=w_orig, c=c,
                               kh=kh, n_tiles=n_tiles,
                               debug_zero=_debug_zero())

    def tile_spec(off):
        if not halo:  # no halo rows: all three specs alias the current tile
            return pl.BlockSpec((1, th, w, c),
                                lambda bi, hi: (bi, hi, 0, 0),
                                memory_space=pltpu.VMEM)
        # xp carries one zero tile above and below, so tile (hi + off) for
        # off in {0,1,2} is the previous/current/next row tile
        return pl.BlockSpec((1, th, w, c),
                            lambda bi, hi, off=off: (bi, hi + off, 0, 0),
                            memory_space=pltpu.VMEM)

    # Outputs are lane/sublane-padded to full (8, 128) tiles and zero-filled
    # inside the kernel (physical buffer padding must not be garbage — see
    # the kernel body), then sliced back to logical extents here.
    cp = -(-c // 128) * 128
    cs = -(-c // 8) * 8
    from . import hbm_out, pin_hbm

    xp, yp, lnp, dwp = pin_hbm(xp, yp, ln.astype(jnp.float32),
                               dw.astype(jnp.float32))
    v, qk, sq = pl.pallas_call(
        kernel,
        out_shape=(hbm_out((b, h, w, cp), jnp.float32),
                   hbm_out((b, cs, cp), jnp.float32),
                   hbm_out((b, 8, cp), jnp.float32)),
        grid=(b, n_tiles),
        in_specs=[
            tile_spec(0), tile_spec(1), tile_spec(2),
            tile_spec(0), tile_spec(1), tile_spec(2),
            pl.BlockSpec((4, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, 3, 3 * c), lambda bi, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, w, cp), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs, cp), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cp), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        # the kernel's scoped stack (slabs + LN temporaries + 9 shifted conv
        # operands + lane-padded masks) measures ~3x the block footprint;
        # the default 16M scoped-vmem limit rejects th=16 tiles, so claim
        # most of the chip's 128M VMEM explicitly
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=_side_effects()),
    )(xp, xp, xp, yp, yp, yp, lnp, dwp)
    return v[:, :, :w_orig, :c], qk[:, :c, :c], sq[:, :2, :c]
