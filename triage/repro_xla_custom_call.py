"""Minimal standalone repro: a Mosaic tpu_custom_call whose output is
DISCARDED (and whose kernel stores only zeros) poisons an unrelated conv
stack in the same XLA:TPU graph.

No rpeflow imports. Distills the round-3 root-cause chain (PERF.md): in
the flagship forward, enabling any one of the corr/mdta/gdfn Pallas
kernels at batch >= 2 makes the whole output NaN; the kernel body is
irrelevant (zero-store still poisons), the value path is irrelevant
(discarded output still poisons), barriers don't help, and the first
non-finite tensor appears in a plain dilated conv (context network) that
contains no custom call. This script rebuilds that shape of graph from
scratch:

    x -> [conv stack]  -> y ------------------+--> dilated conv stack -> out
             \-> pallas zero-store kernel -> (discarded via barrier)

plus optional HBM pressure buffers (--pressure-gb) since the bug is
batch/allocation-size dependent (buffer-assignment suspect).

Usage (on a real TPU):
    python triage/repro_xla_custom_call.py --batch 2 --hw 144 240 \
        --channels 256 --pressure-gb 8
Exit 0 prints FINITE (no repro at this config), exit 1 prints NON-FINITE
(repro). Sweep --batch/--channels/--pressure-gb to find the threshold.
"""

import argparse
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def zero_kernel(x_ref, o_ref):
    # Stores ONLY zeros — any corruption cannot come from kernel compute.
    o_ref[...] = jnp.zeros_like(o_ref[...])


def pallas_zero(x, th):
    b, h, w, c = x.shape
    return pl.pallas_call(
        zero_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        grid=(b, h // th),
        in_specs=[pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def conv(x, w):
    return jax.nn.leaky_relu(lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))


def dilated(x, w, d):
    return jax.nn.leaky_relu(lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=(144, 240))
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--tile-h", type=int, default=8)
    ap.add_argument("--pressure-gb", type=float, default=0.0,
                    help="extra live HBM, forces buffer-assignment pressure")
    ap.add_argument("--no-discard", action="store_true",
                    help="consume the kernel output instead of discarding it")
    args = ap.parse_args()

    b, (h, w), c = args.batch, args.hw, args.channels
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    ws = [jnp.asarray((rng.randn(3, 3, c, c) * (1.5 / np.sqrt(9 * c)))
                      .astype(np.float32)) for _ in range(8)]
    n_pressure = int(args.pressure_gb * 2 ** 30 / 4 / (1 << 20))
    pressure = [jnp.asarray(rng.randn(1 << 20).astype(np.float32))
                for _ in range(n_pressure)]

    @jax.jit
    def fn(x, ws, pressure):
        y = conv(conv(x, ws[0]), ws[1])
        k = pallas_zero(y, args.tile_h)
        if args.no_discard:
            y = y + k
        else:  # keep the call alive, discard its value (round-3 experiment)
            y = lax.optimization_barrier((k, y))[1]
        for i, d in enumerate((1, 2, 4, 8, 16, 1)):
            y = dilated(y, ws[2 + i], d)
        # keep the pressure buffers live across the whole computation
        p = sum(jnp.sum(q) * 1e-30 for q in pressure) if pressure else 0.0
        return y + p

    out = np.asarray(jax.device_get(fn(x, ws, pressure)))
    finite = bool(np.all(np.isfinite(out)))
    nonfinite = int(np.size(out) - np.sum(np.isfinite(out)))
    print(f"batch={b} hw={h}x{w} c={c} pressure={args.pressure_gb}GB "
          f"discard={not args.no_discard} -> "
          f"{'FINITE' if finite else f'NON-FINITE ({nonfinite} elems)'}")
    return 0 if finite else 1


if __name__ == "__main__":
    sys.exit(main())
