"""Graph neural operator stack: neighbor search, segment ops, integral
transform, GNOBlock (mirrors reference layers/tests for these)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.gno_block import GNOBlock
from neuraloperator_tpu.layers.integral_transform import IntegralTransform
from neuraloperator_tpu.layers.neighbor_search import (
    csr_to_padded,
    native_neighbor_search,
    padded_neighbor_search,
)
from neuraloperator_tpu.layers.segment_csr import (
    masked_segment_reduce,
    segment_csr,
)


def test_padded_matches_native_search():
    rng = np.random.RandomState(0)
    data = rng.rand(50, 3).astype(np.float32)
    queries = rng.rand(20, 3).astype(np.float32)
    radius = 0.3
    csr = native_neighbor_search(data, queries, radius)
    padded = padded_neighbor_search(
        jnp.asarray(data), jnp.asarray(queries), radius, max_neighbors=50
    )
    counts_csr = csr["neighbors_row_splits"][1:] - csr["neighbors_row_splits"][:-1]
    counts_padded = np.asarray(padded["neighbors_mask"].sum(axis=1))
    np.testing.assert_array_equal(counts_csr, counts_padded)
    # same neighbor sets
    for i in range(20):
        s, e = csr["neighbors_row_splits"][i], csr["neighbors_row_splits"][i + 1]
        ref = set(csr["neighbors_index"][s:e].tolist())
        mask = np.asarray(padded["neighbors_mask"][i])
        got = set(np.asarray(padded["neighbors_index"][i])[mask].tolist())
        assert ref == got


def test_csr_to_padded_roundtrip_counts():
    rng = np.random.RandomState(1)
    data = rng.rand(30, 2).astype(np.float32)
    queries = rng.rand(10, 2).astype(np.float32)
    csr = native_neighbor_search(data, queries, 0.4, return_norm=True)
    padded = csr_to_padded(csr)
    assert "neighbors_norm" in padded
    counts = csr["neighbors_row_splits"][1:] - csr["neighbors_row_splits"][:-1]
    np.testing.assert_array_equal(
        counts, np.asarray(padded["neighbors_mask"].sum(axis=1))
    )


def test_segment_csr_sum_mean():
    src = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    indptr = jnp.asarray([0, 2, 2, 6])
    out = segment_csr(src, indptr, reduction="sum")
    np.testing.assert_allclose(
        np.asarray(out), [[2, 4], [0, 0], [28, 32]]
    )
    out_mean = segment_csr(src, indptr, reduction="mean")
    np.testing.assert_allclose(
        np.asarray(out_mean), [[1, 2], [0, 0], [7, 8]]
    )


def test_masked_segment_reduce():
    values = jnp.ones((3, 4, 2))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0], [1, 1, 1, 1]], bool)
    out = masked_segment_reduce(values, mask, "sum")
    np.testing.assert_allclose(np.asarray(out)[:, 0], [2, 1, 4])
    out = masked_segment_reduce(values, mask, "mean")
    np.testing.assert_allclose(np.asarray(out)[:, 0], [1, 1, 1])


@pytest.mark.parametrize(
    "transform_type", ["linear", "nonlinear", "linear_kernelonly", "nonlinear_kernelonly"]
)
def test_integral_transform_types(transform_type):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(30, 2), jnp.float32)
    x = jnp.asarray(rng.rand(10, 2), jnp.float32)
    f_y = jnp.asarray(rng.rand(30, 8), jnp.float32)
    neighbors = padded_neighbor_search(y, x, 0.5, max_neighbors=16)
    # kernel output channels must match f_y channels when multiplied by f
    out_ch = 4 if transform_type == "nonlinear_kernelonly" else 8
    in_dim = 4 + (8 if transform_type.startswith("nonlinear") else 0)
    if transform_type == "linear_kernelonly":
        f_y = None  # transform (a): pure kernel integral
        in_dim = 4
    it = IntegralTransform(
        channel_mlp_layers=(in_dim, 16, out_ch), transform_type=transform_type
    )
    variables = it.init(jax.random.PRNGKey(0), y, neighbors, x, f_y)
    out = it.apply(variables, y, neighbors, x, f_y)
    assert out.shape == (10, out_ch)
    assert np.all(np.isfinite(np.asarray(out)))


def test_integral_transform_batched_f():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(30, 2), jnp.float32)
    x = jnp.asarray(rng.rand(10, 2), jnp.float32)
    f_y = jnp.asarray(rng.rand(4, 30, 8), jnp.float32)
    neighbors = padded_neighbor_search(y, x, 0.5, max_neighbors=16)
    it = IntegralTransform(channel_mlp_layers=(4, 16, 8), transform_type="linear")
    variables = it.init(jax.random.PRNGKey(0), y, neighbors, x, f_y)
    out = it.apply(variables, y, neighbors, x, f_y)
    assert out.shape == (4, 10, 8)


def test_gno_block_forward_backward():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(40, 3), jnp.float32)
    x = jnp.asarray(rng.rand(12, 3), jnp.float32)
    f_y = jnp.asarray(rng.rand(40, 6), jnp.float32)
    # 'linear' multiplies the kernel by f_y -> out_channels == f channels
    gno = GNOBlock(
        in_channels=6, out_channels=6, coord_dim=3, radius=0.5,
        max_neighbors=16,
    )
    variables = gno.init(jax.random.PRNGKey(0), y, x, f_y)
    out = gno.apply(variables, y, x, f_y)
    assert out.shape == (12, 6)
    g = jax.grad(
        lambda p: jnp.sum(gno.apply({"params": p}, y, x, f_y) ** 2)
    )(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gno_block_jit():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(40, 3), jnp.float32)
    x = jnp.asarray(rng.rand(12, 3), jnp.float32)
    f_y = jnp.asarray(rng.rand(40, 6), jnp.float32)
    gno = GNOBlock(
        in_channels=6, out_channels=4, coord_dim=3, radius=0.5, max_neighbors=8,
        transform_type="nonlinear_kernelonly",
    )
    variables = gno.init(jax.random.PRNGKey(0), y, x, f_y)
    out = jax.jit(lambda p, a, b, c: gno.apply({"params": p}, a, b, c))(
        variables["params"], y, x, f_y
    )
    assert out.shape == (12, 4)
