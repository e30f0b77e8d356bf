"""Fourier continuation + divergence-free projection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.fourier_continuation import FCGram, FCLegendre
from neuraloperator_tpu.layers.spectral_projection import (
    spectral_projection_divergence_free,
)
from neuraloperator_tpu.losses import FiniteDiff


@pytest.mark.parametrize("cls", [FCLegendre, FCGram])
def test_fc_extension_shapes_and_restrict(cls):
    fc = cls(d=4, n_additional_pts=20)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 32), jnp.float32)
    ext = fc.extend(x, dim=1)
    assert ext.shape == (2, 1, 52)
    back = fc.restrict(ext, dim=1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_fc_legendre_reduces_spectral_leakage():
    """Extending a non-periodic ramp should dramatically reduce the energy
    in high modes relative to raw FFT of the ramp."""
    n = 64
    xs = np.linspace(0, 1, n)
    f = jnp.asarray(xs + 0.3 * xs ** 2, jnp.float32)[None]
    fc = FCLegendre(d=4, n_additional_pts=30)
    ext = fc.extend(f, dim=1)

    def hi_energy(sig):
        sp = np.abs(np.fft.rfft(np.asarray(sig)[0]))
        return sp[len(sp) // 2 :].sum() / sp.sum()

    assert hi_energy(ext) < 0.1 * hi_energy(f)


def test_fc_extension_2d():
    fc = FCLegendre(d=3, n_additional_pts=12)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 16, 20), jnp.float32)
    ext = fc.extend(x, dim=2)
    assert ext.shape == (2, 1, 28, 32)


def test_divergence_free_projection():
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(2, 2, 32, 32), jnp.float32)
    proj = spectral_projection_divergence_free(u)
    assert proj.shape == u.shape
    # spectral divergence k . u_hat of the projection must vanish
    ph = np.fft.rfftn(np.asarray(proj), axes=(-2, -1))
    uhat = np.fft.rfftn(np.asarray(u), axes=(-2, -1))
    kx = np.fft.fftfreq(32, d=1 / 32)[:, None]
    ky = np.fft.rfftfreq(32, d=1 / 32)[None, :]
    div_p = np.abs(kx * ph[:, 0] + ky * ph[:, 1]).max()
    div_u = np.abs(kx * uhat[:, 0] + ky * uhat[:, 1]).max()
    assert div_p < 1e-3 * div_u
    # projecting twice is idempotent
    proj2 = spectral_projection_divergence_free(proj)
    np.testing.assert_allclose(
        np.asarray(proj2), np.asarray(proj), atol=1e-4
    )
