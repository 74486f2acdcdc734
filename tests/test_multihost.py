"""Two-process CPU jax.distributed test of the multi-host data path.

The reference's only distribution mechanism is single-node DDP
(train.py:288-289); rpeflow_tpu additionally supports multi-host via
``jax.distributed`` + per-process batch slices. The single-process
8-device GSPMD path is covered by test_train_step; this test covers what
that cannot: ``maybe_initialize_distributed`` (env opt-in),
``shard_batch``'s make_array_from_process_local_data assembly, and
``replicate``'s make_array_from_callback path across REAL process
boundaries (2 processes x 4 virtual CPU devices = one 8-device mesh).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    "--xla_backend_optimization_level=0")
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from rpeflow_tpu.parallel import mesh as M

assert M.maybe_initialize_distributed(), "distributed init did not engage"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = M.get_mesh()

# each process contributes its local half of the global batch (the
# DataLoader shard_index/num_shards slicing produces exactly this)
local = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 1000.0 * pid)
gbatch = M.shard_batch({"x": local}, mesh)
assert gbatch["x"].shape == (8, 3), gbatch["x"].shape

from jax.sharding import NamedSharding, PartitionSpec as P
total = jax.jit(
    lambda t: jnp.sum(t["x"]),
    out_shardings=NamedSharding(mesh, P()))(gbatch)
expected = float(np.arange(12).sum() * 2 + 1000.0 * 12)
assert float(total) == expected, (float(total), expected)

# replicate: identical host values on every process -> global replicated
rep = M.replicate({"w": np.full((5,), 7.0, np.float32)}, mesh)
wsum = jax.jit(lambda t: jnp.sum(t["w"]),
               out_shardings=NamedSharding(mesh, P()))(rep)
assert float(wsum) == 35.0, float(wsum)

print(f"MULTIHOST_OK {pid}")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-4000:]
