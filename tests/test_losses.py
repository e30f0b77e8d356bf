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


class TestFourierDiffAPI:
    """Full reference-API coverage: compute_multiple_derivatives, derivative,
    partial, gradient, divergence, curl — closed-form fields in 1/2/3-D,
    periodic and FC-extended (reference differentiation.py:1002-1166)."""

    def test_compute_multiple_derivatives_1d(self):
        n = 64
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        u = jnp.asarray(np.sin(2 * xs))[None]
        fd = FourierDiff(dim=1)
        d1, d2, d3 = fd.compute_multiple_derivatives(u, [1, 2, 3])
        assert np.abs(np.asarray(d1)[0] - 2 * np.cos(2 * xs)).max() < 1e-4
        assert np.abs(np.asarray(d2)[0] + 4 * np.sin(2 * xs)).max() < 1e-4
        assert np.abs(np.asarray(d3)[0] + 8 * np.cos(2 * xs)).max() < 1e-3

    def test_derivative_and_partial_2d(self):
        n = 48
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        u = jnp.asarray(np.sin(X) * np.cos(2 * Y))[None]
        fd = FourierDiff(dim=2)
        dux = np.asarray(fd.derivative(u, (1, 0)))[0]
        assert np.abs(dux - np.cos(X) * np.cos(2 * Y)).max() < 1e-4
        dxy = np.asarray(fd.derivative(u, (1, 1)))[0]
        assert np.abs(dxy + 2 * np.cos(X) * np.sin(2 * Y)).max() < 1e-3
        assert np.allclose(
            np.asarray(fd.partial(u, "y", 1)), np.asarray(fd.dy(u)), atol=1e-6
        )

    def test_gradient_shapes_and_values(self):
        n = 32
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        u1 = jnp.asarray(np.sin(xs))[None]
        g1 = FourierDiff(dim=1).gradient(u1)
        assert g1.shape == (1, 1, n)
        assert np.abs(np.asarray(g1)[0, 0] - np.cos(xs)).max() < 1e-4

        X, Y = np.meshgrid(xs, xs, indexing="ij")
        u2 = jnp.asarray(np.sin(X) * np.cos(Y))[None]
        g2 = FourierDiff(dim=2).gradient(u2)
        assert g2.shape == (1, 2, n, n)
        assert np.abs(np.asarray(g2)[0, 0] - np.cos(X) * np.cos(Y)).max() < 1e-4
        assert np.abs(np.asarray(g2)[0, 1] + np.sin(X) * np.sin(Y)).max() < 1e-4

    def test_divergence_curl_2d(self):
        n = 32
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        vx, vy = np.sin(X) * np.cos(Y), np.cos(X) * np.sin(Y)
        v = jnp.asarray(np.stack([vx, vy]))[None]  # (1, 2, n, n)
        fd = FourierDiff(dim=2)
        div = np.asarray(fd.divergence(v))[0]
        assert np.abs(div - 2 * np.cos(X) * np.cos(Y)).max() < 1e-4
        curl = np.asarray(fd.curl(v))[0]
        # curl = dx(vy) - dy(vx) = -sin X sin Y + sin X sin Y = 0
        assert np.abs(curl).max() < 1e-4

    def test_divergence_curl_3d(self):
        n = 16
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        vx = np.sin(X) * np.cos(Y) * np.sin(Z)
        vy = np.cos(X) * np.sin(Y) * np.cos(Z)
        vz = np.sin(X) * np.sin(Y) * np.cos(Z)
        v = jnp.asarray(np.stack([vx, vy, vz]))[None]
        fd = FourierDiff(dim=3)
        div = np.asarray(fd.divergence(v))[0]
        expected = (
            np.cos(X) * np.cos(Y) * np.sin(Z)
            + np.cos(X) * np.cos(Y) * np.cos(Z)
            - np.sin(X) * np.sin(Y) * np.sin(Z)
        )
        assert np.abs(div - expected).max() < 1e-3
        curl = np.asarray(fd.curl(v))[0]
        assert curl.shape == (3, n, n, n)
        cx = (
            np.sin(X) * np.cos(Y) * np.cos(Z)
            + np.cos(X) * np.sin(Y) * np.sin(Z)
        )
        assert np.abs(curl[0] - cx).max() < 1e-3

    def test_laplacian_3d(self):
        n = 16
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        u = jnp.asarray(np.sin(X) * np.cos(Y) * np.sin(Z))[None]
        lap = np.asarray(FourierDiff(dim=3).laplacian(u))[0]
        assert np.abs(lap + 3 * np.asarray(u)[0]).max() < 1e-3

    def test_fc_extended_non_periodic(self):
        # non-periodic polynomial on [0, 1]: FC route recovers derivative
        n = 100
        xs = np.linspace(0, 1, n)
        u = jnp.asarray(xs ** 2)[None]
        fd = FourierDiff(
            dim=1, L=1.0, use_fc="Legendre", fc_degree=4,
            fc_n_additional_pts=50,
        )
        du = np.asarray(fd.dx(u))[0]
        interior = slice(5, -5)
        assert np.abs(du - 2 * xs).max() < 0.4
        assert np.abs((du - 2 * xs)[interior]).max() < 5e-2

    def test_fc_gram_route(self):
        n = 80
        xs = np.linspace(0, 1, n)
        u = jnp.asarray(np.exp(xs))[None]
        fd = FourierDiff(dim=1, L=1.0, use_fc="gram", fc_degree=4,
                         fc_n_additional_pts=30)
        du = np.asarray(fd.dx(u))[0]
        assert np.abs((du - np.exp(xs))[5:-5]).max() < 5e-2

    def test_low_pass_filter(self):
        n = 64
        xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
        clean = np.sin(2 * xs)
        noisy = clean + 0.01 * np.sin(30 * xs)
        fd = FourierDiff(dim=1, low_pass_filter_ratio=0.3)
        du = np.asarray(fd.dx(jnp.asarray(noisy)[None]))[0]
        # the 30-mode noise would add 0.3-amplitude ripple; filtered out
        assert np.abs(du - 2 * np.cos(2 * xs)).max() < 1e-2

    def test_invalid_args(self):
        import pytest

        with pytest.raises(ValueError):
            FourierDiff(dim=4)
        with pytest.raises(ValueError):
            FourierDiff(dim=2, L=(1.0,))
        with pytest.raises(ValueError):
            FourierDiff(dim=2, use_fc="chebyshev")
        fd = FourierDiff(dim=1)
        with pytest.raises(ValueError):
            fd.dy(jnp.ones((4,)))
        with pytest.raises(ValueError):
            fd.derivative(jnp.ones((4,)), (1, 0))
        with pytest.raises(ValueError):
            fd.curl(jnp.ones((1, 4)))
        fd2 = FourierDiff(dim=2)
        with pytest.raises(ValueError):
            fd2.divergence(jnp.ones((1, 3, 8, 8)))
        with pytest.raises(ValueError):
            fd2.partial(jnp.ones((1, 8, 8)), "z")


def test_fc_gram_odd_additional_pts_scale():
    """Regression: FCGram silently decrements odd n_additional_pts; the
    FourierDiff domain rescale must use the layer's actual count or every
    derivative picks up a systematic scale error."""
    n = 100
    xs = np.linspace(0, 1, n)
    u = jnp.asarray(xs ** 3)[None]
    fd = FourierDiff(dim=1, L=1.0, use_fc="gram", fc_degree=4,
                     fc_n_additional_pts=51)  # odd -> FC uses 50
    du = np.asarray(fd.dx(u))[0]
    interior = slice(10, -10)
    rel = np.abs((du - 3 * xs ** 2)[interior]).max() / 3.0
    assert rel < 2e-2, rel


def test_h1_rel_precomputed_ynorm_matches_plain():
    """rel(..., ynorm_sq=precomputed) == plain rel: d(x)-d(y) = d(x-y)
    by FD linearity, and the denominator is target-only."""
    import jax.numpy as jnp

    from neuraloperator_tpu.losses import H1Loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 1, 16, 16), jnp.float32)
    y = jnp.asarray(rng.randn(4, 1, 16, 16), jnp.float32)
    h1 = H1Loss(d=2)
    plain = float(h1(x, y))
    pre = float(h1(x, y, ynorm_sq=h1.ynorm_sq(y)))
    assert abs(plain - pre) <= 1e-5 * abs(plain)
    # also across reductions / non-periodic boundaries
    h1m = H1Loss(d=2, reduction="mean", periodic_in_x=False)
    assert abs(
        float(h1m(x, y)) - float(h1m(x, y, ynorm_sq=h1m.ynorm_sq(y)))
    ) <= 1e-5 * abs(float(h1m(x, y)))
