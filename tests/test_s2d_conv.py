"""Space-to-depth first-conv parity: the s2d formulation must match the
plain stride-2 convs exactly (same canonical params, different lowering).

Reference behavior covered: models/pwc2d_core.py:6-25 (ResidualBlock); the
s2d path is a pure TPU-lowering optimization and must be invisible to
checkpoints and numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpeflow_tpu.nn.pyramid2d import FeaturePyramid2D, ResidualBlock


@pytest.mark.parametrize("cin,h,w", [(3, 32, 48), (20, 32, 48)])
def test_residual_block_s2d_parity(rng, cin, h, w):
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    plain = ResidualBlock(16, norm="batch_norm", s2d=False)
    s2d = ResidualBlock(16, norm="batch_norm", s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    # identical param tree: the s2d conv creates the same canonical kernels
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_map(jnp.shape, variables) == jax.tree_util.tree_map(
        jnp.shape, v2)

    out_plain = plain.apply(variables, x)
    out_s2d = s2d.apply(variables, x)
    assert out_plain.shape == out_s2d.shape == (2, h // 2, w // 2, 16)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_s2d),
                               rtol=1e-5, atol=1e-5)


def test_residual_block_s2d_grad_parity(rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    plain = ResidualBlock(8, s2d=False)
    s2d = ResidualBlock(8, s2d=True)
    variables = plain.init(jax.random.PRNGKey(1), x)

    def loss(v, module):
        return jnp.sum(module.apply(v, x) ** 2)

    g_plain = jax.grad(loss)(variables, plain)
    g_s2d = jax.grad(loss)(variables, s2d)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_plain, g_s2d)


def test_feature_pyramid_s2d_toggle(rng, monkeypatch):
    """Same variables drive both paths; outputs match across the pyramid."""
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    pyr = FeaturePyramid2D([3, 8, 16, 16])

    monkeypatch.delenv("RPEFLOW_NO_S2D", raising=False)
    variables = pyr.init(jax.random.PRNGKey(0), x)
    outs_s2d = pyr.apply(variables, x)

    monkeypatch.setenv("RPEFLOW_NO_S2D", "1")
    outs_plain = pyr.apply(variables, x)

    for a, b in zip(outs_s2d, outs_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
