"""Localize the NaN: forward outputs, loss terms, per-term gradients."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/tests")
from test_end_to_end import _cfg, _write_synthetic_ft3d

tmp = tempfile.mkdtemp()
root = os.path.join(tmp, "data")
_write_synthetic_ft3d(root, "train", 4)
log_dir = os.path.join(tmp, "logs")
cfgs = _cfg(root, log_dir)

from rpeflow_tpu.data.loader import DataLoader
from rpeflow_tpu.train.factory import dataset_factory, model_factory

ds = dataset_factory(cfgs.trainset)
loader = DataLoader(ds, 2, shuffle=True, num_workers=0, seed=0, drop_last=True)
model = model_factory(cfgs.model)

batches = [
    {k: v for k, v in b.items() if k != "index"} for b in loader
]
print("n batches:", len(batches))

variables = model.init({"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
                       batches[0], train=True, compute_mi=True, compute_loss=True)
params, batch_stats = variables["params"], variables["batch_stats"]


def nan_leaves(tree):
    out = []
    for p, v in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating) and np.isnan(a).any():
            out.append(jax.tree_util.keystr(p))
    return out


for bi, batch in enumerate(batches):
    for term in ("loss_2d", "loss_3d", "mi_loss", "loss"):
        def loss_fn(p):
            _, aux = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                compute_mi=True, compute_loss=True,
                rngs={"mi": jax.random.PRNGKey(7)}, mutable=["batch_stats"],
            )[0] if False else model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                compute_mi=True, compute_loss=True,
                rngs={"mi": jax.random.PRNGKey(7)}, mutable=["batch_stats"])
            return aux[term] if term != "loss" else aux["loss"]

        def loss_only(p):
            (_, aux), _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                compute_mi=True, compute_loss=True,
                rngs={"mi": jax.random.PRNGKey(7)}, mutable=["batch_stats"])
            return aux[term]

        val, grads = jax.value_and_grad(loss_only)(params)
        bad = nan_leaves(grads)
        print(f"batch {bi} {term}: value={float(val):.4f} "
              f"nan-grad arrays={len(bad)}")
        if bad:
            print("   ", bad[:8])
    break
