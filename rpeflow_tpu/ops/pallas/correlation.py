"""Pallas TPU kernel for the all-pairs local 2D cost volume.

Replaces the reference CUDA kernel (models/csrc/correlation/
correlation_forward_kernel.cu:11-55). The shifted-multiply XLA formulation
reads each feature map ~(2d+1)^2 times from HBM; this kernel instead keeps a
row-tile of ``f1`` plus a haloed slab of ``f2`` resident in VMEM and emits all
displacement channels in one pass — HBM traffic drops from O(81 * HWC) to
O(HWC).

Halo handling: Mosaic cannot DMA-slice sub-lane-tile arrays, so instead of a
manual halo DMA the kernel receives TWO consecutive row-tiles of a
halo-padded ``f2`` (block index maps hi and hi+1). With the top padding set to
exactly ``d`` and row tiles of at least ``2d`` rows, the two tiles always
cover the ``±d`` halo of the current output tile. Pallas's automatic
pipelining double-buffers the fetches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def pallas_supported(x: jnp.ndarray) -> bool:
    """Use the Pallas path only when we are actually compiling for TPU."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_row_tile(h: int, w: int, c: int, d: int) -> int | None:
    """Smallest sublane-aligned divisor of h with >= 2d rows.

    Small to minimize VMEM stack usage (the unrolled displacement windows
    keep several row-tile buffers live). Alignment matters for correctness:
    un-aligned row tiles / width (e.g. 9-row tiles on a 36x60 map) were
    observed to read stale physical-padding garbage in-context even though
    they pass standalone parity — stick to multiples of 8.
    """
    if w % 8 != 0:
        return None
    for t in range(max(2 * d, 8), h + 1):
        if h % t == 0 and t % 8 == 0:
            return t
    return None


def _corr_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, d, th, w, c):
    f1 = f1_ref[0]  # [th, w, c]
    # The logical output channel count is padded up to the lane width (128)
    # and zero-filled: XLA consumers reduce over the channel axis, and the
    # custom-call output's physical lane padding must not be garbage.
    out_ref[0] = jnp.zeros_like(out_ref[0])
    # Padded rows [hi*th, hi*th + 2*th); output row r of this tile sits at
    # local padded row r + d, so displacement window di starts at local row di.
    slab = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0)

    side = 2 * d + 1
    inv_c = 1.0 / c
    for di in range(side):
        for dj in range(side):
            win = jax.lax.slice(slab, (di, dj, 0), (di + th, dj + w, c))
            out_ref[0, :, :, di * side + dj] = jnp.sum(f1 * win, axis=-1) * inv_c


@functools.partial(jax.jit, static_argnums=(2,))
def correlation2d_pallas(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int) -> jnp.ndarray:
    """``f1, f2: [B, H, W, C]`` -> ``[B, H, W, (2d+1)^2]`` cost volume."""
    b, h, w, c = f1.shape
    d = max_displacement
    side = 2 * d + 1

    # Unaligned maps (e.g. the 36x60 level-3 pyramid): zero-pad H/W up to the
    # 8-sublane tile multiple and slice the output back. The op zero-pads f2
    # outside the frame anyway, so correlations at valid pixels are
    # unchanged, and f1's zero rows/cols only produce discarded zeros.
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        f1p = jnp.pad(f1, ((0, 0), (0, ph), (0, pw), (0, 0)))
        f2p_ = jnp.pad(f2, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return correlation2d_pallas(f1p, f2p_, max_displacement)[:, :h, :w]

    th = _pick_row_tile(h, w, c, d)
    if th is None:  # pathological H: fall back to shifted-multiply
        from ..correlation import correlation2d_ref

        return correlation2d_ref(f1, f2, d)

    n_tiles = h // th
    # Top pad: exactly d rows. Bottom pad: up to (n_tiles + 1) full tiles so
    # block index hi+1 is always in range.
    bottom = (n_tiles + 1) * th - h - d
    f1 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (d, bottom), (d, d), (0, 0)))

    grid = (b, n_tiles)
    kernel = functools.partial(_corr_kernel, d=d, th=th, w=w, c=c)
    out_ch = _round_up(side * side, 128)
    f2_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, th, w + 2 * d, c),
        lambda bi, hi, off=off: (bi, hi + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    from . import hbm_out, pin_hbm
    from .gdfn import _side_effects

    f1, f2p = pin_hbm(f1, f2p)
    out = pl.pallas_call(
        kernel,
        out_shape=hbm_out((b, h, w, out_ch), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            f2_spec(0),
            f2_spec(1),
        ],
        out_specs=pl.BlockSpec((1, th, w, out_ch), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(has_side_effects=_side_effects()),
    )(f1, f2p, f2p)
    return out[..., : side * side]
