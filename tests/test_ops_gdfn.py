"""Fused GDFN Pallas kernel vs the XLA composition (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref(x, w_in, w_dw, w_out):
    hidden = w_in.shape[1] // 2
    h = jnp.einsum("bhwc,cd->bhwd", x, w_in)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(h)
    height, width = x.shape[1:3]
    for di in range(3):
        for dj in range(3):
            acc = acc + hp[:, di:di + height, dj:dj + width, :] * w_dw[di, dj]
    g = jax.nn.gelu(acc[..., :hidden], approximate=False) * acc[..., hidden:]
    return jnp.einsum("bhwd,dc->bhwc", g, w_out)


def test_gdfn_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from rpeflow_tpu.ops.pallas.gdfn import gdfn_pallas

    b, h, w, c, hid = 2, 16, 24, 20, 53
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    w_in = jnp.asarray(rng.randn(c, 2 * hid).astype(np.float32) * 0.05)
    w_dw = jnp.asarray(rng.randn(3, 3, 2 * hid).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.randn(hid, c).astype(np.float32) * 0.05)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(gdfn_pallas(x, w_in, w_dw, w_out))
    except Exception as e:  # interpreter support varies by backend
        pytest.skip(f"pallas interpret unavailable: {e}")
    ref = np.asarray(jax.jit(_ref)(x, w_in, w_dw, w_out))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_gdfn_erf_approximation():
    """The in-kernel rational erf must match lax.erf to f32 noise."""
    from rpeflow_tpu.ops.pallas.gdfn import _erf

    x = jnp.linspace(-6.0, 6.0, 4097)
    # A&S 7.1.26 is ~2.5e-7 in exact arithmetic; f32 evaluation adds
    # rounding to ~2e-6 — far below the op's bf16-MXU noise floor
    np.testing.assert_allclose(np.asarray(_erf(x)),
                               np.asarray(jax.lax.erf(x)), atol=5e-6)
