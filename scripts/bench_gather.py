"""Microbenchmark: KNN-gather formulations on TPU.

The 3D branch's dominant cost is gathers of [B, N, k] neighbor rows from
[B, N, C] feature tables (~30-50 ms of the 169 ms eval forward; XLA's
row gather runs at ~34-70 GB/s effective). Variants:

  A) channels-last take_along_axis (current batch_gather)
  B) channels-first take_along_axis on the lane axis ([B, C, N] gather N)
  C) Pallas: whole table VMEM-resident, jnp.take rows (sublane gather)
  D) Pallas: channels-first table in VMEM, lane gather via jnp.take axis=1
  E) one-hot matmul on the MXU (viable at coarse levels only)

Protocol: device-side fori_loop with a serial data dependency between
iterations (see PERF.md measurement notes; per-call dispatch through the
tunnel is ~39 ms so host loops are invalid for <40 ms ops).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K, C = 4, 8192, 16, 128
M = N * K


def chain_bench(step, init, n_iter=30, name=""):
    """Time step:(carry)->carry over a serial device-side loop."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, n_iter, lambda i, c: step(c), carry)

    out = run(init)                      # compile + warmup
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    t0 = time.perf_counter()
    out = run(init)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.perf_counter() - t0) / n_iter * 1000
    print(f"{name}: {dt:.3f} ms/iter")
    return dt


rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
idx = jnp.asarray(rng.randint(0, N, size=(B, M)).astype(np.int32))


def feed(out, t):
    """Map gather output back into the table: serial dependency, ~free."""
    return t + out.ravel()[0] * 1e-30


# A: channels-last rows
def step_a(t):
    out = jnp.take_along_axis(t, idx[..., None], axis=1)  # [B, M, C]
    return feed(out, t)


# B: channels-first lane gather
def step_b(t):  # t: [B, C, N]
    out = jnp.take_along_axis(t, idx[:, None, :], axis=2)  # [B, C, M]
    return feed(out, t)


# C: pallas row (sublane) gather, table resident in VMEM, M tiled
TILE_M = 2048


def _kern_rows(idx_ref, table_ref, out_ref):
    m = pl.program_id(1)
    idx_tile = idx_ref[0, 0, pl.ds(m * TILE_M, TILE_M)]
    out_ref[0] = jnp.take(table_ref[0], idx_tile, axis=0)


def pallas_rows(t, i):
    i = i.reshape(B, 1, M)
    return pl.pallas_call(
        _kern_rows,
        grid=(B, M // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_M, C), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), t.dtype),
    )(i, t)


# E: pallas per-row loop with dynamic slices
def _kern_rowloop(idx_ref, table_ref, out_ref):
    m = pl.program_id(1)

    def body(j, _):
        out_ref[0, j] = table_ref[0, idx_ref[0, 0, m * TILE_M + j]]
        return 0

    jax.lax.fori_loop(0, TILE_M, body, 0)


def pallas_rowloop(t, i):
    i = i.reshape(B, 1, M)
    return pl.pallas_call(
        _kern_rowloop,
        grid=(B, M // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_M, C), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), t.dtype),
    )(i, t)


def step_e(t):
    out = pallas_rowloop(t, idx)
    return feed(out, t)


def step_c(t):
    out = pallas_rows(t, idx)
    return feed(out, t)


# D: pallas lane gather, channels-first
def _kern_lanes(idx_ref, table_ref, out_ref):
    m = pl.program_id(1)
    idx_tile = idx_ref[0, 0, pl.ds(m * TILE_M, TILE_M)]
    out_ref[0] = jnp.take(table_ref[0], idx_tile, axis=1)


def pallas_lanes(t, i):  # t: [B, C, N]
    i = i.reshape(B, 1, M)
    return pl.pallas_call(
        _kern_lanes,
        grid=(B, M // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE_M), lambda b, m: (b, 0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, M), t.dtype),
    )(i, t)


def step_d(t):
    out = pallas_lanes(t, idx)
    return feed(out, t)


def sweep_c():
    """Row-rate vs bandwidth regime: time variant A across row widths and
    dtypes. If time is ~constant in C, the gather is row-rate-bound and
    merging duplicate-index gathers (xyz+feat one table) is a direct win;
    if linear in C, bf16 tables halve it."""
    for c, dt in [(8, np.float32), (32, np.float32), (64, np.float32),
                  (128, np.float32), (256, np.float32),
                  (128, np.dtype("bfloat16")), (256, np.dtype("bfloat16"))]:
        t = jnp.asarray(rng.randn(B, N, c).astype(np.float32))
        if dt != np.float32:
            t = t.astype(jnp.bfloat16)

        def step(tt):
            out = jnp.take_along_axis(tt, idx[..., None], axis=1)
            return tt + out.ravel()[0].astype(tt.dtype) * 1e-30

        dtms = chain_bench(step, t, name=f"A C={c} {t.dtype.name}")
        byts = B * M * c * t.dtype.itemsize / 1e9
        print(f"   rows {B*M/1e3:.0f}k x {c*t.dtype.itemsize}B "
              f"-> {byts / (dtms / 1e3):.0f} GB/s, "
              f"{dtms*1e6/(B*M):.1f} ns/row")


if __name__ == "__main__":
    if "sweep" in sys.argv[1:]:
        sweep_c()
        sys.exit(0)
    which = sys.argv[1:] or ["a", "b", "c", "d"]
    # correctness check vs A on small slices first
    ref = np.asarray(jnp.take_along_axis(table, idx[..., None], axis=1))
    if "c" in which:
        try:
            got = np.asarray(pallas_rows(table.reshape(B, N, C), idx))
            print("C max err:", np.abs(got - ref).max())
        except Exception as e:
            print(f"C failed: {type(e).__name__}: {str(e)[:300]}")
            which = [w for w in which if w != "c"]
    if "d" in which:
        try:
            tf = jnp.transpose(table, (0, 2, 1)).copy()
            got = np.asarray(pallas_lanes(tf, idx))
            got = np.transpose(got, (0, 2, 1))
            print("D max err:", np.abs(got - ref).max())
        except Exception as e:
            print(f"D failed: {type(e).__name__}: {str(e)[:300]}")
            which = [w for w in which if w != "d"]
    if "e" in which:
        try:
            got = np.asarray(pallas_rowloop(table, idx))
            print("E max err:", np.abs(got - ref).max())
        except Exception as e:
            print(f"E failed: {type(e).__name__}: {str(e)[:300]}")
            which = [w for w in which if w != "e"]

    bw = B * M * C * 4 / 1e9
    print(f"payload {bw * 1e3:.1f} MB/call")
    if "a" in which:
        dt = chain_bench(step_a, table, name="A take_along rows")
        print(f"   -> {bw / (dt / 1e3):.0f} GB/s effective")
    if "b" in which:
        dt = chain_bench(step_b, jnp.transpose(table, (0, 2, 1)).copy(),
                         name="B take_along lanes (cf)")
        print(f"   -> {bw / (dt / 1e3):.0f} GB/s effective")
    if "c" in which:
        dt = chain_bench(step_c, table, name="C pallas row gather")
        print(f"   -> {bw / (dt / 1e3):.0f} GB/s effective")
    if "d" in which:
        dt = chain_bench(step_d, jnp.transpose(table, (0, 2, 1)).copy(),
                         name="D pallas lane gather (cf)")
        print(f"   -> {bw / (dt / 1e3):.0f} GB/s effective")
    if "e" in which:
        dt = chain_bench(step_e, table, name="E pallas row loop")
        print(f"   -> {bw / (dt / 1e3):.0f} GB/s effective")
