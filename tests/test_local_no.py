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


def test_unstructured_disco_transpose():
    """DiscreteContinuousConvTranspose2d (reference :479-681): shapes,
    per-output normalization, and adjoint consistency of the filter."""
    from neuraloperator_tpu.layers.discrete_continuous_convolution import (
        DiscreteContinuousConvTranspose2d,
    )

    rng = np.random.RandomState(1)
    in_coords = rng.rand(15, 2).astype(np.float32)
    out_coords = rng.rand(40, 2).astype(np.float32)
    psi_t = precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=(2,), radius_cutoff=0.5,
        transpose=True,
    )
    assert psi_t.shape[1:] == (40, 15)
    conv = DiscreteContinuousConvTranspose2d(
        in_channels=4, out_channels=3, kernel_shape=(2,)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 15))
    variables = conv.init(jax.random.PRNGKey(1), x, jnp.asarray(psi_t))
    y = conv.apply(variables, x, jnp.asarray(psi_t))
    assert y.shape == (2, 3, 40)
    assert np.isfinite(np.asarray(y)).all()

    # per-(basis, output-point) normalization: nonzero rows sum to ~1
    sums = np.abs(psi_t).sum(axis=2)
    nz = sums[sums > 1e-6]
    np.testing.assert_allclose(nz, 1.0, rtol=1e-4)


def test_disco_transpose_filter_adjoint_consistency():
    """With uniform quadrature weights and no normalization the transpose
    filter (B->A grids) is exactly the adjoint of the forward filter
    (A->B) for the isotropic basis."""
    rng = np.random.RandomState(2)
    A = rng.rand(12, 2).astype(np.float32)
    B = rng.rand(20, 2).astype(np.float32)
    q_a = np.full(12, 1.0 / 12, np.float32)
    q_b = np.full(20, 1.0 / 20, np.float32)

    psi_fwd = precompute_filter_matrix(
        A, B, kernel_shape=(3,), radius_cutoff=0.5,
        quadrature_weights=q_a, normalize=False,
    )  # (K, |B|, |A|)
    psi_t = precompute_filter_matrix(
        B, A, kernel_shape=(3,), radius_cutoff=0.5,
        quadrature_weights=q_b, normalize=False, transpose=True,
    )  # (K, |A|, |B|)
    # strip each side's quadrature weights, compare raw basis evaluations
    raw_fwd = psi_fwd / q_a[None, None, :]
    raw_t = psi_t / q_b[None, None, :]
    np.testing.assert_allclose(
        raw_t, np.transpose(raw_fwd, (0, 2, 1)), atol=1e-5
    )


@pytest.mark.parametrize("basis_type", ["piecewise_linear", "morlet", "zernike"])
def test_unstructured_basis_types(basis_type):
    from neuraloperator_tpu.layers.discrete_continuous_convolution import (
        num_basis_functions,
    )

    rng = np.random.RandomState(3)
    in_coords = rng.rand(25, 2).astype(np.float32)
    out_coords = rng.rand(10, 2).astype(np.float32)
    ks = (2, 3) if basis_type != "zernike" else (2,)
    psi = precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=ks, radius_cutoff=0.6,
        basis_type=basis_type,
    )
    assert psi.shape == (num_basis_functions(ks, basis_type), 10, 25)
    assert np.isfinite(psi).all()


def test_periodic_filter_matrix_wraps():
    """Points near opposite edges of the unit torus are neighbors."""
    A = np.array([[0.02, 0.5]], np.float32)
    B = np.array([[0.98, 0.5]], np.float32)
    psi_np = precompute_filter_matrix(
        A, B, kernel_shape=(2,), radius_cutoff=0.2, normalize=False
    )
    psi_p = precompute_filter_matrix(
        A, B, kernel_shape=(2,), radius_cutoff=0.2, normalize=False,
        periodic=True,
    )
    assert np.abs(psi_np).sum() == 0.0  # euclidean distance 0.96 > cutoff
    assert np.abs(psi_p).sum() > 0.0    # wrapped distance 0.04 < cutoff


def test_unstructured_disco_groups():
    """Regression: groups > 1 implements the reference's grouped einsum."""
    from neuraloperator_tpu.layers.discrete_continuous_convolution import (
        DiscreteContinuousConv2d,
        DiscreteContinuousConvTranspose2d,
    )

    rng = np.random.RandomState(7)
    in_coords = rng.rand(20, 2).astype(np.float32)
    out_coords = rng.rand(12, 2).astype(np.float32)
    psi = jnp.asarray(precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=(2,), radius_cutoff=0.5))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 20))

    conv = DiscreteContinuousConv2d(
        in_channels=4, out_channels=6, kernel_shape=(2,), groups=2)
    v = conv.init(jax.random.PRNGKey(1), x, psi)
    y = conv.apply(v, x, psi)
    assert y.shape == (2, 6, 12)
    # grouping really masks cross-group mixing: zeroing group-2 input
    # channels must not change group-1 outputs
    x2 = x.at[:, 2:].set(0.0)
    y2 = conv.apply(v, x2, psi)
    np.testing.assert_allclose(
        np.asarray(y[:, :3]), np.asarray(y2[:, :3]), atol=1e-6)

    psi_t = jnp.asarray(precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=(2,), radius_cutoff=0.5,
        transpose=True))
    tconv = DiscreteContinuousConvTranspose2d(
        in_channels=4, out_channels=6, kernel_shape=(2,), groups=2)
    vt = tconv.init(jax.random.PRNGKey(2), x, psi_t)
    yt = tconv.apply(vt, x, psi_t)
    assert yt.shape == (2, 6, 12)


def test_unstructured_conv_zernike_basis_end_to_end():
    """Regression: basis_type must size the weight to the psi it receives."""
    from neuraloperator_tpu.layers.discrete_continuous_convolution import (
        DiscreteContinuousConv2d,
    )

    rng = np.random.RandomState(8)
    in_coords = rng.rand(18, 2).astype(np.float32)
    out_coords = rng.rand(9, 2).astype(np.float32)
    psi = jnp.asarray(precompute_filter_matrix(
        in_coords, out_coords, kernel_shape=(2,), radius_cutoff=0.6,
        basis_type="zernike"))
    conv = DiscreteContinuousConv2d(
        in_channels=3, out_channels=2, kernel_shape=(2,),
        basis_type="zernike")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 18))
    v = conv.init(jax.random.PRNGKey(1), x, psi)
    assert conv.apply(v, x, psi).shape == (1, 2, 9)
