"""Legacy spectral conv tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.layers.legacy_spectral_convolution import (
    JointFactorizedSpectralConv,
    SpectralConv1d,
    SpectralConv2d,
    SpectralConv3d,
    SubConv,
)


def test_legacy_1d():
    conv = SpectralConv1d(in_channels=3, out_channels=4, n_modes=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    v = conv.init(jax.random.PRNGKey(1), x)
    assert conv.apply(v, x).shape == (2, 4, 16)


def test_legacy_2d():
    conv = SpectralConv2d(in_channels=3, out_channels=4, n_modes=(4, 5))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    v = conv.init(jax.random.PRNGKey(1), x)
    assert conv.apply(v, x).shape == (2, 4, 16, 16)


def test_legacy_3d():
    conv = SpectralConv3d(in_channels=2, out_channels=3, n_modes=(3, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 10, 10, 10))
    v = conv.init(jax.random.PRNGKey(1), x)
    assert conv.apply(v, x).shape == (1, 3, 10, 10, 10)


def test_joint_factorization_subconv():
    conv = JointFactorizedSpectralConv(
        in_channels=3, out_channels=3, n_modes=(4, 8), n_layers=2,
        factorization="tucker", rank=0.5,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    v = conv.init(jax.random.PRNGKey(1), x, layer_index=0)
    y0 = conv.apply(v, x, layer_index=0)
    y1 = conv.apply(v, x, layer_index=1)
    assert y0.shape == (2, 3, 16, 16)
    # layers share the joint tensor but use different slices
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    sub = SubConv(lambda xx, **kw: conv.apply(v, xx, **kw), 1)
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(y1))
