"""Tests for the batched JAX Navier-Stokes solver (ns_solver.py).

Validates the data-generation scheme behind the reference's nsforcing
dataset (reference neuralop/data/datasets/navier_stokes.py:15-21) against
analytic solutions.
"""

import numpy as np
import pytest

from neuraloperator_tpu.data.datasets.ns_solver import (
    gaussian_rf_vorticity,
    simulate_navier_stokes_2d,
    trajectories_to_pairs,
)


def test_taylor_green_exact_decay():
    """w0 = sin sin is an exact NS solution: advection vanishes, w decays
    as exp(-8 pi^2 nu t)."""
    n, nu = 32, 1e-2
    xs = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    w0 = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    out = np.asarray(
        simulate_navier_stokes_2d(
            w0[None], visc=nu, T=0.5, dt=1e-3, record_dt=0.25, forcing_amp=0.0
        )
    )
    assert out.shape == (1, 2, n, n)
    for i, t in enumerate((0.25, 0.5)):
        exact = w0 * np.exp(-8 * np.pi**2 * nu * t)
        err = np.linalg.norm(out[0, i] - exact) / np.linalg.norm(exact)
        assert err < 1e-3, (t, err)


def test_forced_steady_component():
    """With zero IC, the early-time solution follows the linearized forced
    response: w_hat grows toward f_hat / (nu*lap) on the forced modes."""
    n, nu = 32, 1e-1
    w0 = np.zeros((1, n, n), dtype=np.float32)
    out = np.asarray(
        simulate_navier_stokes_2d(w0, visc=nu, T=2.0, dt=1e-3, record_dt=2.0)
    )
    # forcing 0.1(sin+cos)(2pi(x+y)) excites k=(1,1); linear steady state:
    # w_inf = f / (nu * 4 pi^2 * |k|^2) = f / (nu * 8 pi^2)
    xs = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    f = 0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y)))
    w_inf = f / (nu * 8 * np.pi**2)
    decay = np.exp(-nu * 8 * np.pi**2 * 2.0)
    expected = w_inf * (1 - decay)
    err = np.linalg.norm(out[0, -1] - expected) / np.linalg.norm(expected)
    assert err < 0.05, err  # nonlinear correction is small but nonzero


def test_grf_statistics_and_determinism():
    rng = np.random.default_rng(3)
    w0 = gaussian_rf_vorticity(rng, 8, 64)
    assert w0.shape == (8, 64, 64)
    assert abs(w0.mean()) < 0.05
    assert 0.05 < w0.std() < 1.0
    # mean mode removed per-sample
    assert np.abs(w0.mean(axis=(-2, -1))).max() < 1e-5
    w0b = gaussian_rf_vorticity(np.random.default_rng(3), 8, 64)
    np.testing.assert_array_equal(w0, w0b)


def test_dt_refinement_consistency():
    """Halving dt changes the T=0.5 solution by < 1e-3 relative (the scheme
    is converged at the f32 level for these parameters)."""
    rng = np.random.default_rng(0)
    w0 = gaussian_rf_vorticity(rng, 1, 32)
    a = np.asarray(
        simulate_navier_stokes_2d(w0, visc=1e-3, T=0.5, dt=1e-3, record_dt=0.5)
    )
    b = np.asarray(
        simulate_navier_stokes_2d(w0, visc=1e-3, T=0.5, dt=5e-4, record_dt=0.5)
    )
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-3


def test_trajectories_to_pairs():
    traj = np.arange(2 * 4 * 3 * 3, dtype=np.float32).reshape(2, 4, 3, 3)
    x, y = trajectories_to_pairs(traj)
    assert x.shape == (6, 3, 3)
    np.testing.assert_array_equal(x[0], traj[0, 0])
    np.testing.assert_array_equal(y[0], traj[0, 1])
    np.testing.assert_array_equal(x[3], traj[1, 0])
    x2, y2 = trajectories_to_pairs(traj, stride=2)
    assert x2.shape == (4, 3, 3)
    np.testing.assert_array_equal(y2[0], traj[0, 2])


def test_record_dt_validation():
    w0 = np.zeros((1, 16, 16), dtype=np.float32)
    with pytest.raises(ValueError):
        simulate_navier_stokes_2d(w0, T=1.0, dt=0.3, record_dt=1.0)
