"""Segmented eval forward must equal the single-jit forward.

The segmented path (model/segmented.py) exists to dodge the XLA:TPU
large-graph tpu_custom_call miscompile (PERF.md "Round-3 root-cause
chain") — it re-groups the SAME math into smaller jits, so its outputs
must match ``model.apply(..., train=False, compute_mi=False,
compute_loss=False)`` to fusion-reassociation tolerance.
"""

import numpy as np
import pytest

from rpeflow_tpu.model.segmented import _level_chunks, make_segmented_forward

from test_model_smoke import TINY_MODEL_CFG, tiny_batch

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model_and_vars():
    import jax

    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=TINY_MODEL_CFG, n_samples_list=(128, 64, 32, 16, 8))
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b)
    )(batch)
    return model, variables, batch


def test_level_chunks():
    assert _level_chunks(5, "level") == [[5], [4], [3], [2], [1]]
    assert _level_chunks(5, "pairs") == [[5, 4, 3], [2, 1]]
    assert _level_chunks(5, "decode") == [[5, 4, 3, 2, 1]]
    assert _level_chunks(2, "pairs") == [[2, 1]]
    assert _level_chunks(2, "level") == [[2], [1]]


def test_segmented_forward_matches_single_jit(model_and_vars):
    import jax

    model, variables, batch = model_and_vars
    ref, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=False, compute_mi=False,
                                 compute_loss=False)
    )(variables, batch)

    fwd = make_segmented_forward(model, mode="level")
    assert fwd.n_segments == 2 + len(model.n_samples_list)
    out = fwd(variables, batch)

    np.testing.assert_allclose(np.asarray(out["flow_2d"]),
                               np.asarray(ref["flow_2d"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["flow_3d"]),
                               np.asarray(ref["flow_3d"]),
                               rtol=1e-4, atol=1e-4)


def test_segmented_grouping_matches_per_level(model_and_vars):
    """Coarser groupings only move jit boundaries; outputs must agree."""
    model, variables, batch = model_and_vars
    out_level = make_segmented_forward(model, mode="level")(variables, batch)
    fwd = make_segmented_forward(model, mode="decode")
    assert fwd.n_segments == 3
    out_decode = fwd(variables, batch)
    np.testing.assert_allclose(np.asarray(out_decode["flow_2d"]),
                               np.asarray(out_level["flow_2d"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_decode["flow_3d"]),
                               np.asarray(out_level["flow_3d"]),
                               rtol=1e-4, atol=1e-4)
