"""Single-pass depthwise Pallas kernel vs the flat shift-multiply oracle.

The flat tap sum (nn/mdta.py:_dw_flat) is the reference semantics the
reference's grouped depthwise convs compute (restormer_arch.py:88-108,
169-204, modulo XLA/cuDNN accumulation order); the Pallas kernel must match
it on unaligned shapes (W not a multiple of 8, C not a multiple of 128,
H with only odd divisors — the flagship decode levels are 144x240 .. 9x15).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpeflow_tpu.nn.mdta import _dw_flat


@pytest.mark.parametrize("b,h,w,c", [
    (2, 16, 24, 20),     # aligned-ish, small
    (1, 9, 15, 130),     # coarsest decode level shape class; c > 128
    (2, 6, 10, 257),     # unaligned everything, 3 channel tiles
    (1, 18, 30, 130),    # th=9 < h: exercises the cross-tile halo rows
])
def test_dwconv_pallas_interpret(rng, b, h, w, c):
    from jax.experimental.pallas import tpu as pltpu

    from rpeflow_tpu.ops.pallas.dwconv import dwconv_pallas

    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    taps = jnp.asarray(rng.randn(3, 3, c).astype(np.float32) * 0.2)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(dwconv_pallas(x, taps))
    except Exception as e:  # interpreter support varies by backend
        pytest.skip(f"pallas interpret unavailable: {e}")
    ref = np.asarray(jax.jit(lambda z, t: _dw_flat(z, t, 3))(x, taps))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dwconv_tile_picker_covers_decode_levels():
    from rpeflow_tpu.ops.pallas.dwconv import dwconv_ok

    # flagship 576x960 decode levels x widest GDFN hidden (2*2.66*192)
    for hh, ww in [(144, 240), (72, 120), (36, 60), (18, 30), (9, 15)]:
        assert dwconv_ok((4, hh, ww, 1022)), (hh, ww)


def test_dw_single_pass_grads_match_flat(rng, monkeypatch):
    """The custom VJP must return exactly the flat form's gradients.

    On CPU the kernel path never triggers (backend gate), so substitute the
    flat form for the Pallas forward and check the VJP wiring end to end.
    """
    from rpeflow_tpu.nn import mdta

    monkeypatch.setattr(
        "rpeflow_tpu.ops.pallas.dwconv.dwconv_pallas",
        lambda z, t: mdta._dw_flat(z, t, 3))

    x = jnp.asarray(rng.randn(2, 8, 12, 24).astype(np.float32))
    taps = jnp.asarray(rng.randn(3, 3, 24).astype(np.float32) * 0.2)

    def loss_fused(z, t):
        return jnp.sum(jnp.sin(mdta._dw_single_pass(z, t)))

    def loss_flat(z, t):
        return jnp.sum(jnp.sin(mdta._dw_flat(z, t, 3)))

    gx_f, gt_f = jax.grad(loss_fused, argnums=(0, 1))(x, taps)
    gx_r, gt_r = jax.grad(loss_flat, argnums=(0, 1))(x, taps)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r), atol=1e-5)


def test_dw_kill_switch(monkeypatch):
    """dw is QUARANTINED (round 4): off by default, opt-in via
    RPEFLOW_PALLAS_DW=1 / RPEFLOW_PALLAS_ALL=1; RPEFLOW_NO_PALLAS_DW=1
    always wins."""
    from rpeflow_tpu.ops import pallas as P

    for var in ("RPEFLOW_NO_PALLAS_DW", "RPEFLOW_PALLAS_DW",
                "RPEFLOW_PALLAS_ALL"):
        monkeypatch.delenv(var, raising=False)
    assert not P.pallas_enabled("dw")          # quarantined default
    monkeypatch.setenv("RPEFLOW_PALLAS_DW", "1")
    assert P.pallas_enabled("dw")              # explicit opt-in
    monkeypatch.setenv("RPEFLOW_NO_PALLAS_DW", "1")
    assert not P.pallas_enabled("dw")          # kill switch wins
    monkeypatch.delenv("RPEFLOW_NO_PALLAS_DW")
    monkeypatch.delenv("RPEFLOW_PALLAS_DW")
    monkeypatch.setenv("RPEFLOW_PALLAS_ALL", "1")
    assert P.pallas_enabled("dw")              # quarantine lift
