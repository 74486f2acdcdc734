"""Device mesh + sharding utilities.

TPU-native replacement for the reference's DDP/NCCL distribution (reference
train.py:65,112-116 and SURVEY.md §2.3): a 1-D ``data`` mesh, batches sharded
over it, parameters replicated. The train step is a single jitted function
with GSPMD sharding annotations — gradient all-reduces, SyncBatchNorm-style
cross-replica statistics and metric reductions all fall out of XLA's
partitioner over ICI; there is no rendezvous server, port, or process group.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None,
             axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_for_batch(batch_size: int, axis_name: str = DATA_AXIS) -> Mesh:
    """Data mesh over the largest device prefix that divides the batch."""
    devices = jax.devices()
    if batch_size % len(devices) != 0:
        n_use = max(k for k in range(1, len(devices) + 1) if batch_size % k == 0)
        devices = devices[:n_use]
    return get_mesh(devices, axis_name)


def make_batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = make_batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
