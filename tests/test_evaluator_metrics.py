"""Evaluator metric accumulation: the in-graph sums behind eval_withocc /
eval_noocc (reference eval_withocc.py:83-108, eval_noocc.py:80-101).

Checks the masking semantics against a plain-numpy oracle: validity-mask
channels, NaN exclusion, Fl outlier definition, and the non-occluded split.
"""

import numpy as np
import jax.numpy as jnp

from rpeflow_tpu.train.evaluator import _metric_sums


def _oracle(f2, f3, t2, t3, occ, with_occ):
    mask2 = t2[..., 2] > 0 if t2.shape[-1] > 2 else np.ones(t2.shape[:3], bool)
    mask3 = t3[..., 3] > 0 if t3.shape[-1] > 3 else np.ones(t3.shape[:2], bool)
    e2 = np.linalg.norm(f2 - t2[..., :2], axis=-1)
    e3 = np.linalg.norm(f3 - t3[..., :3], axis=-1)
    mask2 = mask2 & ~np.isnan(e2)
    mask3 = mask3 & ~np.isnan(e3)
    mag = np.linalg.norm(t2[..., :2], axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        fl = (e2 > 3.0) & (e2 / mag > 0.05)
    out = {
        "2d/counts": mask2.sum(),
        "2d/EPE2d": e2[mask2].sum(),
        "2d/1px": (e2 < 1.0)[mask2].sum(),
        "2d/Fl": fl[mask2].sum(),
        "3d/counts": mask3.sum(),
        "3d/EPE3d": e3[mask3].sum(),
        "3d/5cm": (e3 < 0.05)[mask3].sum(),
        "3d/10cm": (e3 < 0.1)[mask3].sum(),
    }
    if with_occ:
        noc = (occ == 0) & mask3
        out.update({
            "3dnoc/counts": noc.sum(),
            "3dnoc/EPE3d": e3[noc].sum(),
            "3dnoc/5cm": (e3 < 0.05)[noc].sum(),
            "3dnoc/10cm": (e3 < 0.1)[noc].sum(),
        })
    return out


def _case(rng, with_occ, masked_targets, with_nan):
    b, h, w, n = 2, 8, 10, 64
    f2 = rng.randn(b, h, w, 2).astype(np.float32) * 3
    f3 = rng.randn(b, n, 3).astype(np.float32) * 0.1
    if with_nan:
        f2[0, 0, 0] = np.nan
        f3[0, 0] = np.nan
    t2 = rng.randn(b, h, w, 3 if masked_targets else 2).astype(np.float32) * 3
    t3 = rng.randn(b, n, 4 if masked_targets else 3).astype(np.float32) * 0.1
    if masked_targets:
        t2[..., 2] = rng.rand(b, h, w) > 0.3
        t3[..., 3] = rng.rand(b, n) > 0.3
    occ = (rng.rand(b, n) > 0.7).astype(np.uint8)

    outputs = {"flow_2d": jnp.asarray(f2), "flow_3d": jnp.asarray(f3)}
    batch = {"flow_2d": jnp.asarray(t2), "flow_3d": jnp.asarray(t3),
             "occ_mask_3d": jnp.asarray(occ)}
    got = {k: float(v) for k, v in
           _metric_sums(outputs, batch, with_occ).items()}
    want = _oracle(f2, f3, t2, t3, occ, with_occ)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], float(want[k]), rtol=1e-5,
                                   err_msg=k)
    return got


def test_metric_sums_with_occ():
    rng = np.random.RandomState(0)
    got = _case(rng, with_occ=True, masked_targets=True, with_nan=True)
    assert "3dnoc/counts" in got


def test_metric_sums_noocc():
    """eval_noocc semantics: no occlusion split keys at all."""
    rng = np.random.RandomState(1)
    got = _case(rng, with_occ=False, masked_targets=True, with_nan=False)
    assert not any(k.startswith("3dnoc") for k in got)


def test_metric_sums_unmasked_targets():
    rng = np.random.RandomState(2)
    _case(rng, with_occ=True, masked_targets=False, with_nan=True)


def test_metric_sums_all_masked_gives_zero_counts():
    """Degenerate input (every pixel masked) must yield zero counts — the
    evaluator then reports NaN metrics with an error log instead of crashing
    (ZeroDivisionError regression, fixed in evaluator.run)."""
    b, h, w, n = 1, 4, 6, 16
    rng = np.random.RandomState(3)
    outputs = {"flow_2d": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
               "flow_3d": jnp.asarray(rng.randn(b, n, 3).astype(np.float32))}
    t2 = np.zeros((b, h, w, 3), np.float32)   # mask channel all zero
    t3 = np.zeros((b, n, 4), np.float32)
    batch = {"flow_2d": jnp.asarray(t2), "flow_3d": jnp.asarray(t3),
             "occ_mask_3d": jnp.zeros((b, n), jnp.uint8)}
    sums = {k: float(v) for k, v in _metric_sums(outputs, batch, True).items()}
    assert sums["2d/counts"] == 0.0
    assert sums["3d/counts"] == 0.0
    assert sums["3dnoc/counts"] == 0.0


def test_train_metrics_all_masked_finite():
    """A fully-masked training sample must not NaN the summary scalars
    (mirror of the evaluator's zero-count guard, on the in-graph path)."""
    import jax.numpy as jnp

    from rpeflow_tpu.model.rpeflow import flow_metrics

    b, h, w, n = 2, 8, 8, 16
    flow_2d = jnp.ones((b, h, w, 2))
    flow_3d = jnp.ones((b, n, 3))
    target_2d = jnp.zeros((b, h, w, 3))   # 3rd channel mask == 0 everywhere
    target_3d = jnp.zeros((b, n, 4))      # 4th channel mask == 0 everywhere
    out = flow_metrics(flow_2d, flow_3d, target_2d, target_3d)
    for k, v in out.items():
        assert np.isfinite(float(v)), k
