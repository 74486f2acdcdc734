"""Flagship-shape TPU regression tests (run with ``RPEFLOW_TEST_TPU=1``).

These exist because of the round-2 incident: a server-side toolchain update
turned the (previously extensively validated) flagship eval forward into
100% NaN with the Pallas kernels enabled, at the flagship shape ONLY — every
CPU-runnable kernel parity test kept passing. Whole-graph, real-hardware,
real-shape checks are the only net that catches that failure class
(VERDICT r2 items 1 and 5). They mirror the role of the reference's
standalone CUDA kernel test binaries
(reference models/csrc/correlation/correlation_test.cpp:44-92) at the
integration level.

Covers:
  * flagship eval forward finiteness with all Pallas kernels enabled;
  * Pallas-vs-XLA whole-forward parity at the flagship shape (tile
    alignment / stale-padding bugs live only in-context);
  * one full-depth (6-level) GSPMD-sharded flagship train step on the real
    chip — a 1-device mesh exercises the same partitioner path the 8-CPU
    tiny-shape test does, but at the flagship k/knn/remat shapes where
    sharding bugs would actually hide.

Compile cost: ~10 min per fresh graph (persistent-cached afterwards), which
is why these are opt-in rather than part of the CPU suite.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RPEFLOW_TEST_TPU"),
    reason="flagship-shape TPU tests are opt-in: set RPEFLOW_TEST_TPU=1",
)

B, H, W, N, BINS = 4, 576, 960, 8192, 10


@pytest.fixture(scope="module")
def flagship():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=B, h=H, w=W, n=N, bins=BINS, with_targets=True)
    variables = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
            bt, train=True, compute_mi=True, compute_loss=True)
    )(batch)
    return model, variables, batch


def _forward(model, variables, batch):
    """Freshly-traced eval forward (fresh trace => Pallas kill switches are
    re-read; see rpeflow_tpu/ops/pallas/__init__.py)."""
    import jax

    @jax.jit
    def fwd(v, bt):
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        return outputs["flow_2d"], outputs["flow_3d"]

    eval_batch = {k: v for k, v in batch.items()
                  if k not in ("flow_2d", "flow_3d")}
    f2d, f3d = fwd(variables, eval_batch)
    return np.asarray(jax.device_get(f2d)), np.asarray(jax.device_get(f3d))


def test_flagship_forward_finite_and_pallas_parity(flagship):
    """The DEFAULT Pallas kernel set (corr+fps after the round-3 mdta/gdfn
    quarantine — ops/pallas/__init__.py) must be finite at the flagship
    shape AND match the XLA-only formulation. Run as one test so both
    graphs compile exactly once. Set RPEFLOW_PALLAS_ALL=1 to additionally
    exercise the quarantined kernels once they are exonerated."""
    model, variables, batch = flagship

    for k in ("RPEFLOW_NO_PALLAS", "RPEFLOW_NO_PALLAS_CORR",
              "RPEFLOW_NO_PALLAS_FPS", "RPEFLOW_NO_PALLAS_MDTA",
              "RPEFLOW_NO_PALLAS_GDFN"):
        assert not os.environ.get(k), \
            f"unset {k} — this test owns the Pallas switches"

    f2d_p, f3d_p = _forward(model, variables, batch)
    assert np.isfinite(f2d_p).all(), \
        f"flow_2d non-finite with Pallas on: {np.mean(~np.isfinite(f2d_p)):.1%}"
    assert np.isfinite(f3d_p).all(), \
        f"flow_3d non-finite with Pallas on: {np.mean(~np.isfinite(f3d_p)):.1%}"

    os.environ["RPEFLOW_NO_PALLAS"] = "1"
    try:
        f2d_x, f3d_x = _forward(model, variables, batch)
    finally:
        del os.environ["RPEFLOW_NO_PALLAS"]
    assert np.isfinite(f2d_x).all() and np.isfinite(f3d_x).all(), \
        "XLA-only forward non-finite — regression is not Pallas-specific"

    # Tolerances: the XLA path runs convs/matmuls through the bf16 MXU with
    # different fusion boundaries than the Pallas kernels; flows are
    # multi-pixel scale. 2D flows in px, 3D in scene units (~20 m depth).
    np.testing.assert_allclose(f2d_p, f2d_x, atol=0.15, rtol=0.05)
    np.testing.assert_allclose(f3d_p, f3d_x, atol=0.02, rtol=0.05)


@pytest.mark.slow
def test_flagship_train_step_gspmd(flagship):
    """Full-depth flagship train step (fwd + losses + MI + bwd + optimizer +
    BN sync) through the GSPMD partitioner on a 1-device mesh."""
    import jax

    from rpeflow_tpu.parallel import get_mesh, replicate, shard_batch
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.optim import optimizer_factory
    from rpeflow_tpu.train.state import (create_train_state, jit_sharded,
                                         make_train_step)

    model, variables, batch = flagship
    mesh = get_mesh(jax.devices()[:1])

    train_cfg = ConfigNode({
        "max_epochs": 2, "optimizer": "adam",
        "lr": {"scheduler": "MultiStepLR", "init_value": 1e-4,
               "decay_rate": 0.5, "decay_milestones": [1]},
        "weight_decay": 1e-6, "bias_decay": 0.0,
    })
    tx, _ = optimizer_factory(train_cfg, variables["params"],
                              steps_per_epoch=10)
    state = replicate(create_train_state(variables, tx), mesh)
    train_step = jit_sharded(make_train_step(model, tx), mesh, n_args=3)

    state, summary = train_step(state, shard_batch(batch, mesh),
                                jax.random.PRNGKey(7))
    loss = float(summary["loss"])
    assert np.isfinite(loss), f"flagship train step loss non-finite: {loss}"
    assert np.isfinite(float(summary["grad_norm"]))
    assert int(state.step) == 1
