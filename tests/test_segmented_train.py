"""Segmented training step vs the monolithic jitted step.

make_segmented_train_step chains per-segment VJPs in Python
(train/segmented_step.py); with MI off both steps are deterministic and
must agree on loss, gradients and parameter updates to fusion-reassociation
tolerance. With MI on, the rng streams differ by construction (documented),
so the check is finiteness + state invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_model_smoke import TINY_MODEL_CFG, tiny_batch

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from rpeflow_tpu.model import RPEFlow
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.optim import optimizer_factory
    from rpeflow_tpu.train.state import create_train_state

    model = RPEFlow(cfgs=TINY_MODEL_CFG, n_samples_list=(128, 64, 32, 16, 8))
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=True)
    tcfg = ConfigNode({
        "max_epochs": 10, "optimizer": "adam",
        "lr": {"scheduler": "MultiStepLR", "init_value": 1e-4,
               "decay_rate": 0.5, "decay_milestones": [5]},
        "weight_decay": 1e-6, "bias_decay": 0.0})
    tx, _ = optimizer_factory(tcfg, variables["params"], steps_per_epoch=10)
    state = create_train_state(variables, tx)
    return model, tx, state, batch


def _flat(tree):
    return {"/".join(str(p.key) for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}


def test_segmented_step_matches_monolith_no_mi(setup, monkeypatch):
    from rpeflow_tpu.train.segmented_step import make_segmented_train_step
    from rpeflow_tpu.train.state import make_train_step

    model, tx, state, batch = setup
    rng = jax.random.PRNGKey(7)
    monkeypatch.setenv("RPEFLOW_SEG_DEBUG_GRADS", "1")

    mono_state, mono_sum = jax.jit(
        make_train_step(model, tx, compute_mi=False))(state, batch, rng)
    seg_state, seg_sum = make_segmented_train_step(
        model, tx, compute_mi=False)(state, batch, rng)

    np.testing.assert_allclose(float(seg_sum["loss"]),
                               float(mono_sum["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(seg_sum["grad_norm"]),
                               float(mono_sum["grad_norm"]), rtol=2e-3)
    assert int(seg_state.step) == int(mono_state.step) == 1

    # Compare GRADIENTS, not post-Adam params: Adam's m/sqrt(v) acts like
    # sign(g) on the first step, amplifying summation-order cancellation
    # noise on near-zero elements (measured: worst |dg| = 1.4e-5 against a
    # global grad norm of ~1.5e3, concentrated on near-cancelled bias
    # leaves) into O(lr) param deltas. A mis-wired cotangent path would
    # shift whole modules' gradients at their own scale and fail the
    # absolute bound by orders of magnitude.
    def loss_fn(params):
        (_, aux), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, compute_mi=False, compute_loss=True,
            mutable=["batch_stats"])
        return aux["loss"]

    g_mono = jax.jit(jax.grad(loss_fn))(state.params)
    g_seg = seg_sum["_debug_grads"]
    mono_g, seg_g = _flat(g_mono), _flat(g_seg)
    assert mono_g.keys() == seg_g.keys()
    for k in mono_g:
        d = np.abs(seg_g[k] - mono_g[k]).max()
        scale = max(float(np.abs(mono_g[k]).max()), 1.0)
        assert d <= 2e-3 * scale + 1e-4, (k, d, scale)

    mono_s, seg_s = _flat(mono_state.batch_stats), _flat(seg_state.batch_stats)
    assert mono_s.keys() == seg_s.keys()
    for k in mono_s:
        np.testing.assert_allclose(seg_s[k], mono_s[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)


def test_segmented_step_with_mi_is_finite(setup):
    from rpeflow_tpu.train.segmented_step import make_segmented_train_step

    model, tx, state, batch = setup
    new_state, summary = make_segmented_train_step(model, tx)(
        state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert np.isfinite(float(summary["loss"]))
    assert np.isfinite(float(summary["mi_loss"]))
    assert float(summary["mi_loss"]) != 0.0
    assert np.isfinite(float(summary["grad_norm"]))
    # params actually moved; the frozen temperature quirk is preserved
    p0 = state.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    p1 = new_state.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    assert float(jnp.abs(p1 - p0).max()) > 0
    t0 = state.params["pwc_fusion_core"]["pyramid_feat_fusers_2d_1"]["fuse"]["attn"]["temperature"]
    t1 = new_state.params["pwc_fusion_core"]["pyramid_feat_fusers_2d_1"]["fuse"]["attn"]["temperature"]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
