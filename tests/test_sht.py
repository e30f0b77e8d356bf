"""Spherical harmonic transform and SFNO tests.

Analytic ground truth: orthonormal Y_lm round trips and known coefficient
patterns (the correctness strategy torch_harmonics itself is tested with).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from neuraloperator_tpu.ops.sht import _quadrature, isht, sht


def _grid(nlat, nlon, grid):
    x, _ = _quadrature(nlat, grid)
    theta = np.arccos(x)
    phi = 2 * np.pi * np.arange(nlon) / nlon
    return np.meshgrid(theta, phi, indexing="ij")


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
@pytest.mark.parametrize("l,m", [(0, 0), (1, 0), (2, 1), (3, 3)])
def test_sht_analytic_delta(grid, l, m):
    """sht of the real part of Y_lm has its energy at (l, m)."""
    nlat, nlon = 24, 48
    theta, phi = _grid(nlat, nlon, grid)
    y = sph_harm_y(l, m, theta, phi)  # scipy: orthonormal, CS phase
    f = np.real(y)
    flm = np.asarray(sht(jnp.asarray(f, jnp.float32), lmax=8, mmax=8, grid=grid))
    # Re(Y_lm) = (Y_lm + conj(Y_lm))/2 -> coefficient 1/2 at (l, m) for m>0,
    # 1 at (l, 0) for m=0
    expected = np.zeros_like(flm)
    expected[l, m] = 1.0 if m == 0 else 0.5
    np.testing.assert_allclose(flm, expected, atol=2e-4)


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
def test_sht_roundtrip_bandlimited(grid):
    """isht(sht(f)) == f for band-limited f."""
    nlat, nlon = 16, 32
    theta, phi = _grid(nlat, nlon, grid)
    f = (
        0.7 * np.real(sph_harm_y(2, 1, theta, phi))
        + 0.2 * np.real(sph_harm_y(5, 3, theta, phi))
        + 1.1 * np.real(sph_harm_y(0, 0, theta, phi))
    )
    # equiangular Fejér quadrature is exact only for degree < nlat, so the
    # truncation degree must satisfy lmax + l_signal < nlat (same constraint
    # as torch_harmonics' equiangular transforms)
    lmax = nlat if grid == "legendre-gauss" else nlat // 2 + 2
    flm = sht(jnp.asarray(f, jnp.float32), lmax=lmax, mmax=lmax, grid=grid)
    back = np.asarray(isht(flm, nlat=nlat, nlon=nlon, grid=grid))
    np.testing.assert_allclose(back, f, atol=2e-4)


def test_sht_batched_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 32))
    flm = sht(x, lmax=8, mmax=8, grid="equiangular")
    assert flm.shape == (2, 3, 8, 8)
    y = isht(flm, nlat=16, nlon=32, grid="equiangular")
    assert y.shape == (2, 3, 16, 32)


def test_spherical_conv_forward_backward():
    from neuraloperator_tpu.layers.spherical_convolution import SphericalConv

    conv = SphericalConv(
        in_channels=3, out_channels=4, n_modes=(8, 8), factorization=None
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 32))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (2, 4, 16, 32)
    g = jax.grad(lambda p: jnp.sum(conv.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.any(np.asarray(leaf) != 0)


def test_spherical_conv_resolution_scaling():
    from neuraloperator_tpu.layers.spherical_convolution import SphericalConv

    conv = SphericalConv(
        in_channels=2, out_channels=2, n_modes=(6, 6),
        resolution_scaling_factor=2, factorization=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 24))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (1, 2, 24, 48)


def test_sfno_forward_backward():
    from neuraloperator_tpu.models import SFNO

    model = SFNO(
        n_modes=(8, 8), in_channels=2, out_channels=2, hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 2, 16, 32)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    unused = [
        1
        for leaf in jax.tree_util.tree_leaves(g)
        if not np.any(np.asarray(leaf) != 0)
    ]
    assert not unused


@pytest.mark.parametrize("factorization", ["cp", "tucker", "tt"])
def test_spherical_conv_factorized_matches_reconstructed(factorization):
    """Factor-space dhconv == reconstructed-weight dhconv."""
    from neuraloperator_tpu.layers.spherical_convolution import SphericalConv

    kwargs = dict(
        in_channels=3, out_channels=4, n_modes=(6, 6),
        factorization=factorization, rank=0.5,
    )
    conv_f = SphericalConv(implementation="factorized", **kwargs)
    conv_r = SphericalConv(implementation="reconstructed", **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 24))
    variables = conv_f.init(jax.random.PRNGKey(1), x)
    y_f = conv_f.apply(variables, x)
    y_r = conv_r.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_r), rtol=2e-4, atol=1e-5
    )
