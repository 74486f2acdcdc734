"""End-to-end model smoke tests on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# ~9 min cold on a 1-core host (full-model traces + CPU compiles) — slow
# tier so `pytest -m "not slow"` stays under a verification window
# (VERDICT r3 item 8).
pytestmark = pytest.mark.slow

from rpeflow_tpu.model import RPEFlow
from rpeflow_tpu.train.config import ConfigNode

TINY_MODEL_CFG = ConfigNode({
    "ids": {"enabled": True, "sensor_size_divisor": 32},
    "pwc2d": {
        "event_bins": 2,
        "event_polarity": True,
        "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
                 "context_network": None},
        "max_displacement": 4,
    },
    "pwc3d": {
        "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                 "flow_estimator": None},
        "k": 8,
    },
    "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
    "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
})


def tiny_batch(rng, b=2, h=128, w=128, n=256, bins=2):
    pc = rng.rand(b, n, 6).astype(np.float32)
    pc[..., 2] = pc[..., 2] * 20 + 2.0   # positive depth
    pc[..., 5] = pc[..., 5] * 20 + 2.0
    return {
        "images": (rng.rand(b, h, w, 6) * 255).astype(np.float32),
        "pcs": pc,
        "event_voxel": rng.rand(b, h, w, 2 * bins).astype(np.float32),
        "intrinsics": np.tile(np.array([[100.0, w / 2 - 0.5, h / 2 - 0.5]],
                                       np.float32), (b, 1)),
        "flow_2d": rng.randn(b, h, w, 2).astype(np.float32),
        "flow_3d": rng.randn(b, n, 3).astype(np.float32) * 0.1,
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = RPEFlow(cfgs=TINY_MODEL_CFG, n_samples_list=(128, 64, 32, 16, 8))
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=True,
    )
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    outputs, aux = model.apply(variables, batch, train=False, compute_mi=False,
                               compute_loss=False)
    assert outputs["flow_2d"].shape == (2, 128, 128, 2)
    assert outputs["flow_3d"].shape == (2, 256, 3)
    assert np.all(np.isfinite(np.asarray(outputs["flow_2d"])))
    assert np.all(np.isfinite(np.asarray(outputs["flow_3d"])))
    assert aux == {}


def test_train_loss_and_metrics(model_and_vars):
    model, variables, batch = model_and_vars
    (outputs, aux), mutated = model.apply(
        variables, batch, train=True, compute_mi=True, compute_loss=True,
        rngs={"mi": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert np.isfinite(float(aux["loss"]))
    for k in ["epe2d", "acc2d_1px", "outlier2d", "epe3d", "acc3d_5cm"]:
        assert np.isfinite(float(aux["scalar_summary"][k])), k


def test_gradients_finite(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (_, aux), _ = model.apply(
            {"params": p, **other}, batch, train=True, compute_mi=True,
            compute_loss=True, rngs={"mi": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return aux["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # at least the final prediction convs must receive gradient
    g = grads["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0


def test_amp_selective_bf16_smoke(rng):
    """YAML ``amp: true`` maps to selective bf16 (pyramids only): forward
    and gradients stay finite, params stay f32, and the non-pyramid path
    (MDTA/fusers) keeps its f32 compute dtype so the fused-GDFN gate and
    f32 attention math are unaffected."""
    model = RPEFlow(cfgs=TINY_MODEL_CFG, n_samples_list=(32, 16, 8), amp=True)
    batch = tiny_batch(rng, b=1, h=64, w=64, n=64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=True)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    def loss_fn(p):
        (_, aux), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=True, compute_mi=True, compute_loss=True,
            rngs={"mi": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
        return aux["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
