"""Loss correctness against analytic values (mirrors reference
losses/tests/test_losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.losses import (
    FiniteDiff,
    FourierDiff,
    H1Loss,
    LpLoss,
    MSELoss,
    central_diff_2d,
)


def test_lploss_scaling():
    """Known values for constant fields (reference test_losses.py:11+)."""
    loss = LpLoss(d=2, p=2, reduction="sum")
    x = jnp.ones((4, 1, 16, 16))
    zeros = jnp.zeros_like(x)
    # abs: sqrt(sum(1) * (1/16)^2 per dim) = sqrt(16*16/(16*16)) = 1 per sample
    assert np.isclose(float(loss.abs(x, zeros)), 4.0, rtol=1e-5)
    # mean reduction
    loss_mean = LpLoss(d=2, p=2, reduction="mean")
    assert np.isclose(float(loss_mean.abs(x, zeros)), 1.0, rtol=1e-5)
    # relative loss of 2y vs y is 1
    assert np.isclose(float(loss.rel(2 * x, x)), 4.0, rtol=1e-4)


def test_lploss_measure_scaling():
    loss1 = LpLoss(d=1, p=2, measure=1.0)
    loss2 = LpLoss(d=1, p=2, measure=4.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 32))
    z = jnp.zeros_like(x)
    assert np.isclose(
        float(loss2.abs(x, z)), 2 * float(loss1.abs(x, z)), rtol=1e-5
    )


def test_h1loss_identity_is_zero():
    h1 = H1Loss(d=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 16, 16))
    assert float(h1.rel(x, x)) < 1e-6


def test_finite_diff_periodic_analytic():
    """Central differences of sin on a periodic grid ~ cos (2nd order)."""
    n = 64
    L = 2 * np.pi
    xs = np.linspace(0, L, n, endpoint=False)
    u = jnp.asarray(np.sin(xs))[None, None]
    fd = FiniteDiff(dim=1, h=L / n, periodic_in_x=True)
    du = np.asarray(fd.dx(u))[0, 0]
    assert np.abs(du - np.cos(xs)).max() < 5e-3
    d2u = np.asarray(fd.dx(u, order=2))[0, 0]
    assert np.abs(d2u + np.sin(xs)).max() < 5e-3


def test_finite_diff_nonperiodic_boundaries():
    """One-sided 3rd-order boundaries for non-periodic data."""
    n = 64
    xs = np.linspace(0, 1, n)
    h = xs[1] - xs[0]
    u = jnp.asarray(xs ** 3)[None, None]
    fd = FiniteDiff(dim=1, h=h, periodic_in_x=False)
    du = np.asarray(fd.dx(u))[0, 0]
    assert np.abs(du - 3 * xs ** 2).max() < 1e-2


def test_finite_diff_2d_gradient_laplacian():
    n = 64
    L = 2 * np.pi
    xs = np.linspace(0, L, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    u = jnp.asarray(np.sin(X) * np.cos(Y))[None, None]
    fd = FiniteDiff(dim=2, h=(L / n, L / n))
    du_dx = np.asarray(fd.dx(u))[0, 0]
    du_dy = np.asarray(fd.dy(u))[0, 0]
    assert np.abs(du_dx - np.cos(X) * np.cos(Y)).max() < 5e-3
    assert np.abs(du_dy + np.sin(X) * np.sin(Y)).max() < 5e-3
    lap = np.asarray(fd.laplacian(u))[0, 0]
    assert np.abs(lap + 2 * np.sin(X) * np.cos(Y)).max() < 1e-2


def test_fourier_diff_exact():
    n = 32
    xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    u = jnp.asarray(np.sin(3 * xs))[None]
    fdiff = FourierDiff(dim=1, L=2 * np.pi)
    du = np.asarray(fdiff.dx(u))[0]
    assert np.abs(du - 3 * np.cos(3 * xs)).max() < 1e-5


def test_central_diff_2d_free_function():
    n = 32
    L = 2 * np.pi
    xs = np.linspace(0, L, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    u = jnp.asarray(np.sin(X) * np.cos(Y))
    dx, dy = central_diff_2d(u, L / n)
    assert np.abs(np.asarray(dx) - np.cos(X) * np.cos(Y)).max() < 2e-2


def test_mse_loss():
    x = jnp.ones((2, 1, 4, 4))
    z = jnp.zeros_like(x)
    assert np.isclose(float(MSELoss(reduction="mean")(x, z)), 1.0)
    assert np.isclose(float(MSELoss(reduction="sum")(x, z)), 2.0)
