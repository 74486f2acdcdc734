"""Probe: is enqueue-N-then-read-last honest under this runtime?

Compares three timing protocols on the flagship eval forward:
  A) enqueue N iterations of the same (fn, args), read one element of last out
  B) chained: each iteration's input depends on the previous output (serial
     dependency chain the runtime cannot elide), read one element of last out
  C) per-iter full readback of one element

If A << B the runtime memoizes identical executions and protocol A is NOT a
valid benchmark.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _model_cfg, _synth_batch
from rpeflow_tpu.model import RPEFlow

b, h, w, n = 4, 576, 960, 8192
model = RPEFlow(cfgs=_model_cfg())
rng = np.random.RandomState(0)
batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10)

variables = jax.jit(lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt))(batch)
jax.block_until_ready(variables)
print("init done", file=sys.stderr)


@jax.jit
def fwd(v, bt):
    out, _ = model.apply(v, bt, train=False, compute_mi=False, compute_loss=False)
    return out


@jax.jit
def fwd_chain(v, bt, eps):
    bt = dict(bt)
    bt["images"] = bt["images"] + eps
    out, _ = model.apply(v, bt, train=False, compute_mi=False, compute_loss=False)
    # scalar that depends on the full output
    return out, jnp.sum(out["flow_2d"][0, 0, :8, 0]) * 1e-30  # *0.0 gets const-folded by newer XLA


def sync(x):
    np.asarray(jax.device_get(x))


batch = jax.device_put(batch)
o = fwd(variables, batch)
sync(o["flow_2d"].ravel()[0])
o, e = fwd_chain(variables, batch, jnp.float32(0.0))
sync(e)
print("warmup done", file=sys.stderr)

N = 10
# Protocol A
t0 = time.perf_counter()
for _ in range(N):
    o = fwd(variables, batch)
sync(o["flow_2d"].ravel()[0])
ta = (time.perf_counter() - t0) / N
print(f"A enqueue-identical: {ta*1000:.1f} ms/iter")

# Protocol B
eps = jnp.float32(0.0)
t0 = time.perf_counter()
for _ in range(N):
    o, eps = fwd_chain(variables, batch, eps)
sync(eps)
tb = (time.perf_counter() - t0) / N
print(f"B chained-dependency: {tb*1000:.1f} ms/iter")

# Protocol C
t0 = time.perf_counter()
for _ in range(N):
    o = fwd(variables, batch)
    sync(o["flow_2d"].ravel()[0])
tc = (time.perf_counter() - t0) / N
print(f"C per-iter readback: {tc*1000:.1f} ms/iter")
