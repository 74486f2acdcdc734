"""Parity tests for knn / fps against independent oracles.

Models the reference's native kernel tests
(models/csrc/k_nearest_neighbor/k_nearest_neighbor_test.cpp:24-65,
furthest_point_sampling/furthest_point_sampling_test.cpp:33-64) as pytest.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from rpeflow_tpu.ops import furthest_point_sampling, k_nearest_neighbor, squared_distance


def _fps_numpy(xyz, n_samples):
    b, n, _ = xyz.shape
    out = np.zeros((b, n_samples), np.int64)
    for bi in range(b):
        dists = np.full(n, 1e10)
        curr = 0
        for i in range(n_samples):
            out[bi, i] = curr
            d = np.sum((xyz[bi] - xyz[bi, curr]) ** 2, -1)
            dists = np.minimum(dists, d)
            curr = int(np.argmax(dists))
    return out


@pytest.mark.parametrize("n,q,k,dim", [(256, 128, 16, 3), (100, 300, 4, 3), (500, 50, 1, 2)])
def test_knn_matches_kdtree(rng, n, q, k, dim):
    inp = rng.randn(2, n, dim).astype(np.float32) * 3
    qry = rng.randn(2, q, dim).astype(np.float32) * 3
    idx = np.asarray(k_nearest_neighbor(inp, qry, k))
    assert idx.shape == (2, q, k)
    for bi in range(2):
        tree = cKDTree(inp[bi])
        _, ref = tree.query(qry[bi], k=k)
        ref = ref.reshape(q, k)
        # Compare neighbor distance multisets (tie order may differ).
        d_mine = np.linalg.norm(inp[bi][idx[bi]] - qry[bi][:, None], axis=-1)
        d_ref = np.linalg.norm(inp[bi][ref] - qry[bi][:, None], axis=-1)
        np.testing.assert_allclose(np.sort(d_mine, -1), np.sort(d_ref, -1), rtol=1e-4, atol=1e-4)


def test_knn_chunked_equals_unchunked(rng):
    inp = rng.randn(2, 200, 3).astype(np.float32)
    qry = rng.randn(2, 333, 3).astype(np.float32)
    a = np.asarray(k_nearest_neighbor(inp, qry, 8, chunk_size=64))
    b = np.asarray(k_nearest_neighbor(inp, qry, 8, chunk_size=512))
    np.testing.assert_array_equal(a, b)


def test_knn_sorted_by_distance(rng):
    inp = rng.randn(1, 128, 3).astype(np.float32)
    qry = rng.randn(1, 64, 3).astype(np.float32)
    idx = np.asarray(k_nearest_neighbor(inp, qry, 8))[0]
    d = np.linalg.norm(inp[0][idx] - qry[0][:, None], axis=-1)
    assert np.all(np.diff(d, axis=-1) >= -1e-5)


def test_squared_distance(rng):
    a = rng.randn(2, 10, 3).astype(np.float32)
    b = rng.randn(2, 20, 3).astype(np.float32)
    d = np.asarray(squared_distance(a, b))
    ref = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_fps_matches_numpy(rng):
    xyz = rng.randn(3, 200, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sampling(xyz, 50))
    ref = _fps_numpy(xyz, 50)
    np.testing.assert_array_equal(idx, ref)


def test_fps_spread(rng):
    # FPS should cover the cloud better than the first-k prefix.
    xyz = rng.randn(1, 512, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sampling(xyz, 64))[0]
    sel = xyz[0][idx]
    prefix = xyz[0][:64]
    tree_sel = cKDTree(sel)
    tree_pre = cKDTree(prefix)
    d_sel = tree_sel.query(xyz[0])[0].max()
    d_pre = tree_pre.query(xyz[0])[0].max()
    assert d_sel <= d_pre
    assert len(set(idx.tolist())) == 64


def test_fps_pallas_interpret_matches_scan(rng):
    """Pallas FPS in interpreter mode vs the scan formulation."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from rpeflow_tpu.ops.fps import furthest_point_sampling_scan
    from rpeflow_tpu.ops.pallas.fps import furthest_point_sampling_pallas

    xyz = rng.randn(2, 100, 3).astype(np.float32)
    ref = np.asarray(furthest_point_sampling_scan(xyz, 30))
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(furthest_point_sampling_pallas(xyz, 30))
    except Exception as e:
        import pytest as _pytest

        _pytest.skip(f"pallas interpret unavailable: {e}")
    np.testing.assert_array_equal(out, ref)


def test_knn_backend_switch(rng):
    """exact and approx backends agree on tiny well-separated inputs."""
    from rpeflow_tpu.ops import knn as knn_mod

    inp = (rng.rand(1, 64, 3) * 100).astype(np.float32)  # well separated
    qry = inp[:, :32] + 0.01
    exact = np.asarray(knn_mod.k_nearest_neighbor(inp, qry, 4))
    try:
        knn_mod.set_knn_backend("approx", recall_target=0.99)
        approx = np.asarray(knn_mod.k_nearest_neighbor(inp, qry, 4))
    finally:
        knn_mod.set_knn_backend("auto")
    # nearest neighbor (self) must always be found
    np.testing.assert_array_equal(exact[..., 0], approx[..., 0])


def test_knn_backend_switch_effective_under_outer_jit(rng):
    """set_knn_backend must change the lowered selection op in NEW traces.

    Regression: the backend global used to be baked into a jitted inner
    function's trace cache, making the switch a silent no-op under an outer
    jit (quantify_eval_deviations measured bit-identical exact/approx
    flows). The lowered HLO is the ground truth: approx lowers to an
    ApproxTopK custom call, exact to a sort.
    """
    import jax

    from rpeflow_tpu.ops import knn as knn_mod

    inp = (rng.rand(1, 64, 3) * 100).astype(np.float32)
    qry = inp[:, :32]

    def lower_text():
        # fresh function object per trace (outer jaxprs cache by identity)
        f = lambda i, q: knn_mod.k_nearest_neighbor(i, q, 4)  # noqa: E731
        return jax.jit(f).lower(inp, qry).as_text()

    try:
        knn_mod.set_knn_backend("approx")
        assert "ApproxTopK" in lower_text()
        knn_mod.set_knn_backend("exact")
        assert "ApproxTopK" not in lower_text()
    finally:
        knn_mod.set_knn_backend("auto")
