"""LocalNO stack: differential conv, DISCO convs, LocalNOBlocks, LocalNO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.differential_conv import FiniteDifferenceConvolution
from neuraloperator_tpu.layers.discrete_continuous_convolution import (
    DiscreteContinuousConv2d,
    EquidistantDiscreteContinuousConv2d,
    equidistant_filter_basis,
    num_basis_functions,
    precompute_filter_matrix,
)
from neuraloperator_tpu.models import LocalNO


def test_fd_conv_approximates_derivative():
    """The zero-mean stencil conv converges to a directional derivative:
    applying it to a linear ramp gives a constant field."""
    conv = FiniteDifferenceConvolution(
        in_channels=1, out_channels=1, n_dim=2, kernel_size=3,
        padding="replicate",
    )
    n = 32
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, n)[None, :], (n, n))[None, None]
    variables = conv.init(jax.random.PRNGKey(0), ramp, 1.0 / n)
    out = np.asarray(conv.apply(variables, ramp, 1.0 / n))
    interior = out[0, 0, 4:-4, 4:-4]
    # constant response on a linear function (derivative is constant)
    assert interior.std() < 1e-3 * (abs(interior.mean()) + 1.0)


def test_fd_conv_zero_on_constant():
    """Zero-mean stencil kills constants regardless of weights."""
    conv = FiniteDifferenceConvolution(
        in_channels=2, out_channels=3, n_dim=2, kernel_size=3
    )
    x = jnp.ones((1, 2, 16, 16)) * 7.0
    variables = conv.init(jax.random.PRNGKey(0), x, 0.1)
    out = np.asarray(conv.apply(variables, x, 0.1))
    assert np.abs(out).max() < 1e-4


@pytest.mark.parametrize("kernel_shape", [(2,), (3,), (2, 4)])
def test_filter_basis_properties(kernel_shape):
    psi = equidistant_filter_basis(kernel_shape, 5)
    assert psi.shape[0] == num_basis_functions(kernel_shape)
    # unit integral per basis function
    np.testing.assert_allclose(psi.sum(axis=(1, 2)), 1.0, rtol=1e-5)


def test_equidistant_disco_conv():
    conv = EquidistantDiscreteContinuousConv2d(
        in_channels=3, out_channels=5, kernel_shape=(2, 4), kernel_size=5
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (2, 5, 16, 16)


def test_unstructured_disco_conv():
    rng = np.random.RandomState(0)
    in_coords = rng.rand(40, 2).astype(np.float32)
    out_coords = rng.rand(15, 2).astype(np.float32)
    psi = precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=(2,), radius_cutoff=0.4
    )
    conv = DiscreteContinuousConv2d(
        in_channels=3, out_channels=4, kernel_shape=(2,)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 40))
    variables = conv.init(jax.random.PRNGKey(1), x, jnp.asarray(psi))
    y = conv.apply(variables, x, jnp.asarray(psi))
    assert y.shape == (2, 4, 15)


def test_local_no_forward_backward():
    model = LocalNO(
        n_modes=(6, 6),
        in_channels=2,
        out_channels=1,
        hidden_channels=8,
        default_in_shape=(16, 16),
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 1, 16, 16)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    unused = sum(
        1
        for leaf in jax.tree_util.tree_leaves(g)
        if not np.any(np.asarray(leaf) != 0)
    )
    assert unused == 0


def test_local_no_partial_layers():
    """Per-layer enable flags for diff/disco branches."""
    model = LocalNO(
        n_modes=(4, 4),
        in_channels=1,
        out_channels=1,
        hidden_channels=8,
        default_in_shape=(12, 12),
        n_layers=3,
        diff_layers=(True, False, False),
        disco_layers=(False, True, False),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 12, 12)
