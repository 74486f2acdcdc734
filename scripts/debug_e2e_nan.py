"""Repro: train the e2e-test config, then locate where NaNs appear."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import tempfile

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/tests")
from test_end_to_end import _cfg, _write_synthetic_ft3d

tmp = tempfile.mkdtemp()
root = os.path.join(tmp, "data")
_write_synthetic_ft3d(root, "train", 4)
_write_synthetic_ft3d(root, "val", 2, seed=1)
log_dir = os.path.join(tmp, "logs")

from rpeflow_tpu.train.trainer import Trainer

cfgs = _cfg(root, log_dir)
trainer = Trainer(cfgs)


def count_nan(tree, label):
    flat = jax.tree_util.tree_leaves_with_path(tree)
    bad = [(jax.tree_util.keystr(p), int(np.isnan(np.asarray(v)).sum()))
           for p, v in flat if np.issubdtype(np.asarray(v).dtype, np.floating)
           and np.isnan(np.asarray(v)).any()]
    print(f"--- {label}: {len(bad)} arrays with NaN")
    for name, n in bad[:20]:
        print("   ", name, n)


count_nan(trainer.state.params, "params BEFORE training")
count_nan(trainer.state.batch_stats, "batch_stats BEFORE training")
trainer.run()
count_nan(trainer.state.params, "params AFTER 1 epoch")
count_nan(trainer.state.batch_stats, "batch_stats AFTER 1 epoch")
