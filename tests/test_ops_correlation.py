"""Parity tests for the 2D cost volume.

Models the reference's correlation_test.cpp:44-92 (forward vs naive
shifted-multiply, backward via autograd) as pytest, with a torch oracle
written from the op's definition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rpeflow_tpu.ops import correlation2d, correlation2d_ref


def _corr_torch(f1, f2, d):
    """Independent NHWC oracle in torch."""
    t1 = torch.from_numpy(f1)
    t2 = torch.from_numpy(np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0))))
    h, w = f1.shape[1:3]
    outs = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            outs.append((t1 * t2[:, i:i + h, j:j + w]).mean(-1))
    return torch.stack(outs, -1).numpy()


@pytest.mark.parametrize("d,h,w,c", [(4, 18, 30, 64), (2, 9, 15, 32), (4, 16, 16, 16)])
def test_correlation_forward(rng, d, h, w, c):
    f1 = rng.randn(2, h, w, c).astype(np.float32)
    f2 = rng.randn(2, h, w, c).astype(np.float32)
    out = np.asarray(correlation2d_ref(f1, f2, d))
    ref = _corr_torch(f1, f2, d)
    assert out.shape == (2, h, w, (2 * d + 1) ** 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_correlation_dispatch_matches_ref(rng):
    f1 = rng.randn(1, 18, 20, 32).astype(np.float32)
    f2 = rng.randn(1, 18, 20, 32).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(correlation2d(f1, f2, 4)),
        np.asarray(correlation2d_ref(f1, f2, 4)),
        atol=1e-5,
    )


def test_correlation_grad_matches_autodiff(rng):
    """custom_vjp backward must equal jax autodiff of the jnp formulation."""
    f1 = rng.randn(1, 10, 12, 8).astype(np.float32)
    f2 = rng.randn(1, 10, 12, 8).astype(np.float32)
    g = rng.randn(1, 10, 12, 25).astype(np.float32)

    def loss_custom(a, b):
        return jnp.sum(correlation2d(a, b, 2) * g)

    def loss_ref(a, b):
        return jnp.sum(correlation2d_ref(a, b, 2) * g)

    g1, g2 = jax.grad(loss_custom, argnums=(0, 1))(f1, f2)
    r1, r2 = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=1e-5)


def test_correlation_pallas_interpret(rng):
    """Run the Pallas kernel in interpreter mode and compare to the jnp ref."""
    from rpeflow_tpu.ops.pallas.correlation import correlation2d_pallas

    f1 = rng.randn(2, 36, 60, 32).astype(np.float32)  # unaligned W: padded path
    f2 = rng.randn(2, 36, 60, 32).astype(np.float32)
    try:
        import jax._src.pallas  # noqa: F401
        with jax.disable_jit(False):
            from jax.experimental.pallas import tpu as pltpu  # noqa: F401
            with pltpu.force_tpu_interpret_mode():
                out = np.asarray(correlation2d_pallas(f1, f2, 4))
    except Exception as e:  # interpreter support varies by backend
        pytest.skip(f"pallas interpret unavailable: {e}")
    ref = np.asarray(correlation2d_ref(f1, f2, 4))
    np.testing.assert_allclose(out, ref, atol=1e-4)
