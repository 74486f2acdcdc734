"""Fused flat Adam must match the per-leaf optax chain elementwise.

The fused path (rpeflow_tpu/train/optim.py:_fused_adam) replaces
``multi_transform({...: chain(add_decayed_weights, scale_by_adam,
scale_by_learning_rate)})`` — whose tree-mapped update lowers to ~40k tiny
HLO ops — with one raveled-vector update. Adam is per-element, so the two
must agree to float rounding on every group (weights with decay, biases
without, frozen 'temperature' never moving).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpeflow_tpu.train.config import ConfigNode
from rpeflow_tpu.train.optim import optimizer_factory


def _cfg(**kw):
    base = {
        "max_epochs": 4,
        "optimizer": "adam",
        "lr": {"scheduler": "MultiStepLR", "init_value": 1e-3,
               "decay_rate": 0.5, "decay_milestones": [2]},
        "weight_decay": 1e-2,
        "bias_decay": 0.0,
    }
    base.update(kw)
    return ConfigNode(base)


def _param_tree(rng):
    return {
        "conv": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32),
                 "bias": jnp.asarray(rng.randn(8), jnp.float32)},
        "norm": {"scale": jnp.asarray(rng.randn(8), jnp.float32),
                 "bias": jnp.asarray(rng.randn(8), jnp.float32)},
        "attn": {"temperature": jnp.asarray(rng.randn(2, 1, 1), jnp.float32)},
    }


def test_fused_adam_matches_unfused_chain(rng, monkeypatch):
    params = _param_tree(rng)
    cfg = _cfg()

    monkeypatch.delenv("RPEFLOW_NO_FUSED_OPT", raising=False)
    tx_fused, _ = optimizer_factory(cfg, params, steps_per_epoch=5)
    monkeypatch.setenv("RPEFLOW_NO_FUSED_OPT", "1")
    tx_chain, _ = optimizer_factory(cfg, params, steps_per_epoch=5)

    p_f, p_c = params, params
    s_f, s_c = tx_fused.init(params), tx_chain.init(params)
    for step in range(12):  # crosses the epoch-2 LR milestone
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.RandomState(step).randn(*p.shape), jnp.float32),
            p_f)
        u_f, s_f = tx_fused.update(g, s_f, p_f)
        u_c, s_c = tx_chain.update(g, s_c, p_c)
        import optax
        p_f = optax.apply_updates(p_f, u_f)
        p_c = optax.apply_updates(p_c, u_c)

    flat_f = jax.tree_util.tree_leaves(p_f)
    flat_c = jax.tree_util.tree_leaves(p_c)
    for a, b in zip(flat_f, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # the frozen temperature group must be bit-identical to its init
    np.testing.assert_array_equal(
        np.asarray(p_f["attn"]["temperature"]),
        np.asarray(params["attn"]["temperature"]))


def test_fused_adam_respects_bias_decay_group(rng, monkeypatch):
    params = _param_tree(rng)
    monkeypatch.delenv("RPEFLOW_NO_FUSED_OPT", raising=False)
    tx, _ = optimizer_factory(_cfg(weight_decay=1.0, bias_decay=0.0),
                              params, steps_per_epoch=5)
    state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_g, state, params)
    # with zero grads, only decayed groups move
    assert float(jnp.abs(upd["conv"]["kernel"]).max()) > 0
    assert float(jnp.abs(upd["conv"]["bias"]).max()) == 0
    assert float(jnp.abs(upd["attn"]["temperature"]).max()) == 0
