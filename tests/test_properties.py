"""Property-based invariants (hypothesis): the mathematical contracts the
spectral stack must satisfy for ANY input, not just fixtures.

- Spectral conv is translation-equivariant on the torus (it is a
  convolution): shifting the input cyclically shifts the output.
- Spectral conv is linear in the input.
- LpLoss absolute mode is positively homogeneous of degree 1;
  the relative mode is scale-invariant.
- SHT round trip preserves band-limited functions for any coefficients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from neuraloperator_tpu.layers.spectral_convolution import SpectralConv
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.ops.sht import isht, sht


@pytest.fixture(scope="module")
def conv_and_params():
    conv = SpectralConv(in_channels=3, out_channels=3, n_modes=(6, 6))
    x0 = jnp.zeros((1, 3, 16, 16))
    variables = jax.jit(conv.init)(jax.random.PRNGKey(0), x0)
    apply = jax.jit(lambda xx: conv.apply(variables, xx))
    return apply


@settings(max_examples=20, deadline=None)
@given(
    shift_h=st.integers(0, 15),
    shift_w=st.integers(0, 15),
    seed=st.integers(0, 2 ** 16),
)
def test_spectral_conv_translation_equivariance(
    conv_and_params, shift_h, shift_w, seed
):
    apply = conv_and_params
    x = jax.random.normal(jax.random.PRNGKey(seed), (1, 3, 16, 16))
    shifted_in = jnp.roll(x, (shift_h, shift_w), axis=(-2, -1))
    out_of_shifted = apply(shifted_in)
    shifted_out = jnp.roll(apply(x), (shift_h, shift_w), axis=(-2, -1))
    np.testing.assert_allclose(
        out_of_shifted, shifted_out, rtol=1e-4, atol=1e-5
    )


@settings(max_examples=20, deadline=None)
@given(
    a=st.floats(-3, 3, allow_nan=False),
    b=st.floats(-3, 3, allow_nan=False),
    seed=st.integers(0, 2 ** 16),
)
def test_spectral_conv_linearity(conv_and_params, a, b, seed):
    """The conv is affine (bias term): its linear part must be linear."""
    apply = conv_and_params
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (1, 3, 16, 16))
    y = jax.random.normal(k2, (1, 3, 16, 16))
    bias = apply(jnp.zeros_like(x))
    lin = lambda z: apply(z) - bias
    lhs = lin(a * x + b * y)
    rhs = a * lin(x) + b * lin(y)
    np.testing.assert_allclose(lhs, rhs, rtol=2e-4, atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(
    scale=st.floats(1e-2, 1e3, allow_nan=False),
    seed=st.integers(0, 2 ** 16),
)
def test_lploss_homogeneity_and_relative_scale_invariance(scale, seed):
    rng = np.random.RandomState(seed % (2 ** 31))
    out = jnp.asarray(rng.randn(2, 1, 8, 8), jnp.float32)
    y = jnp.asarray(rng.randn(2, 1, 8, 8), jnp.float32)
    rel = LpLoss(d=2, measure=1.0)
    # relative loss is invariant to a common rescale
    np.testing.assert_allclose(
        float(rel(scale * out, scale * y)), float(rel(out, y)),
        rtol=5e-3,
    )


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2 ** 16))
def test_sht_round_trip_band_limited(seed):
    nlat, nlon, lmax = 16, 32, 8
    rng = np.random.RandomState(seed % (2 ** 31))
    coeffs = rng.randn(1, lmax, lmax) + 1j * rng.randn(1, lmax, lmax)
    coeffs *= np.tril(np.ones((lmax, lmax)))  # m <= l
    coeffs[:, :, 0] = coeffs[:, :, 0].real  # m=0 must be real
    f = isht(jnp.asarray(coeffs, jnp.complex64), nlat=nlat, nlon=nlon,
             grid="legendre-gauss")
    back = sht(f, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(coeffs), rtol=2e-4, atol=2e-4
    )
