"""Data-parallel train step on an 8-device CPU mesh.

The reference had no distributed tests (SURVEY.md §4); here one jitted GSPMD
train step covers what DDP + SyncBatchNorm + NCCL all-reduce did upstream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpeflow_tpu.model import RPEFlow
from rpeflow_tpu.parallel import get_mesh, replicate, shard_batch
from rpeflow_tpu.train.config import ConfigNode
from rpeflow_tpu.train.optim import make_lr_schedule, optimizer_factory
from rpeflow_tpu.train.state import (
    create_train_state,
    jit_sharded,
    make_train_step,
)

from test_model_smoke import TINY_MODEL_CFG, tiny_batch

TRAIN_CFG = ConfigNode({
    "max_epochs": 10,
    "optimizer": "adam",
    "lr": {"scheduler": "MultiStepLR", "init_value": 4e-4, "momentum": 0.9,
           "decay_rate": 0.5, "decay_milestones": [4, 8]},
    "weight_decay": 1e-6,
    "bias_decay": 0.0,
})


@pytest.mark.slow
def test_multidevice_train_step():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = get_mesh(jax.devices()[:8])

    model = RPEFlow(cfgs=TINY_MODEL_CFG, n_samples_list=(128, 64, 32, 16, 8))
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, b=8, n=192)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=True)
    tx, _ = optimizer_factory(TRAIN_CFG, variables["params"], steps_per_epoch=10)
    state = create_train_state(variables, tx)

    train_step = jit_sharded(make_train_step(model, tx), mesh, n_args=3)

    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(42)

    state1, summary = train_step(state, sharded, key)
    assert np.isfinite(float(summary["loss"]))
    assert np.isfinite(float(summary["grad_norm"]))
    assert int(state1.step) == 1

    # params must actually change, temperature must stay frozen (upstream
    # quirk: torch param groups never include it)
    p0 = state.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    p1 = state1.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    assert float(jnp.abs(p1 - p0).max()) > 0
    t0 = state.params["pwc_fusion_core"]["pyramid_feat_fusers_2d_1"]["fuse"]["attn"]["temperature"]
    t1 = state1.params["pwc_fusion_core"]["pyramid_feat_fusers_2d_1"]["fuse"]["attn"]["temperature"]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_lr_schedules():
    sched, gran = make_lr_schedule(TRAIN_CFG, steps_per_epoch=10)
    assert gran == "epoch"
    assert float(sched(0)) == pytest.approx(4e-4)
    assert float(sched(45)) == pytest.approx(2e-4)   # epoch 4 -> one decay
    assert float(sched(95)) == pytest.approx(1e-4)   # epoch 9 -> two decays

    oc_cfg = TRAIN_CFG.merge({"lr": {"scheduler": "OneCycleLR",
                                     "init_value": 1e-3}})
    sched, gran = make_lr_schedule(oc_cfg, steps_per_epoch=10)
    assert gran == "iter"
    assert float(sched(30)) == pytest.approx(1e-3, rel=1e-3)  # peak at 30%
    assert float(sched(0)) < 1e-4


@pytest.mark.slow
def test_full_depth_multidevice_dryrun():
    """Flagship-depth (6-level) GSPMD train step over the 8-CPU mesh.

    VERDICT r2 item 5: decode levels 3-5 (their FPS/knn/fuser shapes and
    remat boundaries) are exactly where sharding bugs would hide, and the
    driver's cheap dryrun truncates them away. Runs in a subprocess because
    dryrun_multichip's compile-budget env (RPEFLOW_NO_REMAT, XLA_FLAGS) must
    be set before rpeflow_tpu.model is imported. ~28 min cold on one core;
    seconds on a warm host-keyed cache (utils/cache.py).

    Image side scales with depth (128x128 at 6 levels): at 64x64 the
    level-6 maps are 1x1, where the loss degenerates to NaN on any backend
    — a shape artifact this test would misreport as a sharding bug.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "RPEFLOW_DRYRUN_LEVELS": "6"})
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=3600)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in p.stdout
