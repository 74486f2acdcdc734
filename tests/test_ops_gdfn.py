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


def test_fused_feedforward_wiring_and_grads(rng, monkeypatch):
    """Lock in the fused-path param-reshape wiring and custom-VJP gradients.

    On CPU the fused path never triggers (backend gate), so force it by
    monkeypatching the gate and substituting the XLA composition for the
    Pallas kernel: any wiring bug (kernel reshape order, residual plumbing)
    or VJP regression then shows up as a fused-vs-plain mismatch.
    """
    import rpeflow_tpu.nn.mdta as mdta
    import rpeflow_tpu.ops.pallas.gdfn as gdfn_mod

    monkeypatch.setattr(mdta, "_gdfn_fused_ok", lambda x, hidden: True)
    monkeypatch.setattr(gdfn_mod, "gdfn_pallas", mdta._gdfn_ref)

    dim = 20
    ff = mdta.FeedForward(dim)
    x = jnp.asarray(rng.randn(2, 8, 12, dim).astype(np.float32))
    variables = ff.init(jax.random.PRNGKey(0), x)

    fused_out, fused_vjp = jax.vjp(lambda v, xx: ff.apply(v, xx), variables, x)

    monkeypatch.setattr(mdta, "_gdfn_fused_ok", lambda x, hidden: False)
    plain_out, plain_vjp = jax.vjp(lambda v, xx: ff.apply(v, xx), variables, x)

    np.testing.assert_allclose(np.asarray(fused_out), np.asarray(plain_out),
                               atol=1e-5, rtol=1e-5)

    g = jnp.asarray(rng.randn(*fused_out.shape).astype(np.float32))
    fused_grads = fused_vjp(g)
    plain_grads = plain_vjp(g)
    for fg, pg in zip(jax.tree_util.tree_leaves(fused_grads),
                      jax.tree_util.tree_leaves(plain_grads)):
        np.testing.assert_allclose(np.asarray(fg), np.asarray(pg),
                                   atol=1e-4, rtol=1e-4)
