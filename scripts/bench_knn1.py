#!/usr/bin/env python
"""Microbench k=1 NN formulations at the decode level-1 shape.

Device-loop protocol (one dispatch, chained iterations) per PERF.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
from jax import lax

B, Q, N, D = 4, 34560, 4096, 2
ITERS = 20


def timed(name, fn, *args):
    args = [jax.device_put(a) for a in args]

    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(*a, offset=carry)
            return out.reshape(-1)[0].astype(jnp.int32)
        return lax.fori_loop(0, ITERS, body, jnp.int32(0))

    loop(*args).block_until_ready()
    t = time.time()
    r = loop(*args)
    np.asarray(r)
    dt = (time.time() - t) / ITERS * 1000
    print(f"{name:30s} {dt:8.3f} ms")


def current(inp, qry, offset=0):
    from rpeflow_tpu.ops.knn import k_nearest_neighbor
    return k_nearest_neighbor(inp, qry + 0.0 * offset, 1)


def broadcast_full(inp, qry, offset=0):
    q = qry + 0.0 * offset
    diff = q[:, :, None, :] - inp[:, None, :, :]
    dist = jnp.sum(diff * diff, axis=-1)
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def broadcast_chunked(inp, qry, offset=0, chunk=4320):
    q = qry + 0.0 * offset
    b, qn, d = q.shape
    nch = qn // chunk
    qc = q.reshape(b, nch, chunk, d).transpose(1, 0, 2, 3)

    def blk(qq):
        diff = qq[:, :, None, :] - inp[:, None, :, :]
        return jnp.argmin(jnp.sum(diff * diff, -1), -1).astype(jnp.int32)

    out = lax.map(blk, qc)
    return out.transpose(1, 0, 2).reshape(b, qn)


def matmul_full(inp, qry, offset=0):
    from rpeflow_tpu.ops.knn import squared_distance
    q = qry + 0.0 * offset
    return jnp.argmin(squared_distance(q, inp), -1).astype(jnp.int32)


def main():
    rng = np.random.RandomState(0)
    inp = rng.rand(B, N, D).astype(np.float32) * 100
    qry = rng.rand(B, Q, D).astype(np.float32) * 100
    timed("current (chunked matmul)", current, inp, qry)
    timed("broadcast full", broadcast_full, inp, qry)
    timed("broadcast chunked 4320", broadcast_chunked, inp, qry)
    timed("matmul full", matmul_full, inp, qry)
    # parity
    a = np.asarray(current(inp, qry))[..., 0]
    for f in (broadcast_full, broadcast_chunked, matmul_full):
        b = np.asarray(f(inp, qry))
        print(f"match {f.__name__}: {(a == b).mean():.4f}")


if __name__ == "__main__":
    main()
