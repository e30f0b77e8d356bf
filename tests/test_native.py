"""Native (C++) host components: grid-hash fixed-radius neighbor search."""

import numpy as np
import pytest

from neuraloperator_tpu.native import fixed_radius_search_cpp, native_available


def _numpy_csr(data, queries, radius):
    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    within = d2 <= radius ** 2
    counts = within.sum(axis=1)
    splits = np.zeros(len(queries) + 1, dtype=np.int64)
    np.cumsum(counts, out=splits[1:])
    return np.nonzero(within)[1].astype(np.int64), splits, d2[within]


needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@needs_native
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_cpp_search_matches_numpy(dim):
    rng = np.random.RandomState(dim)
    data = rng.rand(800, dim).astype(np.float32)
    queries = rng.rand(150, dim).astype(np.float32)
    idx, splits = fixed_radius_search_cpp(data, queries, 0.15)
    ref_idx, ref_splits, _ = _numpy_csr(data, queries, 0.15)
    np.testing.assert_array_equal(splits, ref_splits)
    np.testing.assert_array_equal(idx, ref_idx)


@needs_native
def test_cpp_search_edge_cases():
    rng = np.random.RandomState(0)
    data = rng.rand(50, 3).astype(np.float32)
    # queries far outside the data bounding box -> zero neighbors
    queries = 10.0 + rng.rand(4, 3).astype(np.float32)
    idx, splits = fixed_radius_search_cpp(data, queries, 0.1)
    assert splits[-1] == 0 and len(idx) == 0
    # radius covering everything -> all pairs
    idx, splits = fixed_radius_search_cpp(data, data[:5], 100.0)
    assert splits[-1] == 5 * 50
    np.testing.assert_array_equal(idx[:50], np.arange(50))
    # empty data
    idx, splits = fixed_radius_search_cpp(
        np.zeros((0, 3), np.float32), queries, 0.1
    )
    assert splits[-1] == 0


@needs_native
def test_native_search_wired_into_layer():
    from neuraloperator_tpu.layers.neighbor_search import native_neighbor_search

    rng = np.random.RandomState(1)
    data = rng.rand(300, 2).astype(np.float32)
    queries = rng.rand(80, 2).astype(np.float32)
    out = native_neighbor_search(data, queries, 0.2, return_norm=True)
    ref_idx, ref_splits, ref_norm = _numpy_csr(data, queries, 0.2)
    np.testing.assert_array_equal(out["neighbors_index"], ref_idx)
    np.testing.assert_array_equal(out["neighbors_row_splits"], ref_splits)
    np.testing.assert_allclose(out["neighbors_norm"], ref_norm, rtol=2e-5)


def test_fallback_when_disabled(monkeypatch):
    """With the native lib unavailable the numpy path must serve."""
    import neuraloperator_tpu.layers.neighbor_search as ns
    import neuraloperator_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_lib_tried", True)
    rng = np.random.RandomState(2)
    data = rng.rand(100, 3).astype(np.float32)
    queries = rng.rand(20, 3).astype(np.float32)
    out = ns.native_neighbor_search(data, queries, 0.3)
    ref_idx, ref_splits, _ = _numpy_csr(data, queries, 0.3)
    np.testing.assert_array_equal(out["neighbors_index"], ref_idx)
    np.testing.assert_array_equal(out["neighbors_row_splits"], ref_splits)
