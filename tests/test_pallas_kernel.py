"""Pallas mode-contraction kernel (interpreter mode on CPU)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from neuraloperator_tpu.ops.pallas import spectral_contraction as sc


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_pallas_contraction_matches_einsum(interpret_pallas):
    rng = np.random.RandomState(0)
    M, B, I, O = 300, 8, 32, 32
    xr = jnp.asarray(rng.randn(M, B, I), jnp.float32)
    xi = jnp.asarray(rng.randn(M, B, I), jnp.float32)
    wr = jnp.asarray(rng.randn(M, I, O), jnp.float32)
    wi = jnp.asarray(rng.randn(M, I, O), jnp.float32)
    o_r, o_i = sc.pallas_mode_contraction(xr, xi, wr, wi, tile_m=128)
    er = jnp.einsum("mbi,mio->mbo", xr, wr) - jnp.einsum("mbi,mio->mbo", xi, wi)
    ei = jnp.einsum("mbi,mio->mbo", xr, wi) + jnp.einsum("mbi,mio->mbo", xi, wr)
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(er), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_i), np.asarray(ei), atol=2e-4)


def test_pallas_adapter_shapes(interpret_pallas):
    rng = np.random.RandomState(1)
    x = (
        jnp.asarray(rng.randn(2, 8, 6, 5), jnp.float32),
        jnp.asarray(rng.randn(2, 8, 6, 5), jnp.float32),
    )
    w = (
        jnp.asarray(rng.randn(8, 4, 6, 5), jnp.float32),
        jnp.asarray(rng.randn(8, 4, 6, 5), jnp.float32),
    )
    o_r, o_i = sc.contract_dense_pallas(x, w)
    assert o_r.shape == (2, 4, 6, 5)
