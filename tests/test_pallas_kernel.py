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


def test_pallas_bf16_inputs(interpret_pallas):
    """bf16 operands run with f32 accumulation (MXU-native layout)."""
    rng = np.random.RandomState(2)
    M, B, I, O = 130, 4, 16, 16
    xr = jnp.asarray(rng.randn(M, B, I), jnp.bfloat16)
    xi = jnp.asarray(rng.randn(M, B, I), jnp.bfloat16)
    wr = jnp.asarray(rng.randn(M, I, O), jnp.bfloat16)
    wi = jnp.asarray(rng.randn(M, I, O), jnp.bfloat16)
    o_r, o_i = sc.pallas_mode_contraction(xr, xi, wr, wi, tile_m=128)
    assert o_r.dtype == jnp.float32
    f = jnp.float32
    er = jnp.einsum("mbi,mio->mbo", xr.astype(f), wr.astype(f)) - jnp.einsum(
        "mbi,mio->mbo", xi.astype(f), wi.astype(f)
    )
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(er), atol=0.5, rtol=0.1)


def test_spectral_conv_pallas_backend_matches_xla(interpret_pallas):
    """contract_block dispatches to the Pallas kernel and matches XLA."""
    import jax

    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv
    from neuraloperator_tpu.ops import contractions

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 12, 12), jnp.float32)
    conv = SpectralConv(in_channels=4, out_channels=4, n_modes=(8, 8))
    params = conv.init(jax.random.PRNGKey(0), x)

    ref = conv.apply(params, x)
    contractions.set_contraction_backend("pallas")
    try:
        out = conv.apply(params, x)
    finally:
        contractions.set_contraction_backend("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_spectral_conv_mixed_precision_close_to_full():
    """fno_block_precision='mixed' (bf16 matmuls) tracks the f32 result."""
    import jax

    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 4, 16, 16), jnp.float32)
    conv = SpectralConv(in_channels=4, out_channels=4, n_modes=(8, 8))
    params = conv.init(jax.random.PRNGKey(0), x)
    full = conv.apply(params, x)

    mixed_conv = SpectralConv(
        in_channels=4, out_channels=4, n_modes=(8, 8),
        fno_block_precision="mixed",
    )
    mixed = mixed_conv.apply(params, x)
    err = np.abs(np.asarray(mixed) - np.asarray(full))
    scale = np.abs(np.asarray(full)).max()
    assert err.max() / scale < 0.05, f"mixed-precision drift {err.max()/scale}"


def test_pallas_custom_vjp_matches_xla_grads(interpret_pallas):
    """Gradients through the Pallas path match the XLA contraction path."""
    import jax

    from neuraloperator_tpu.ops import contractions

    rng = np.random.RandomState(5)
    xr = jnp.asarray(rng.randn(2, 6, 4, 3), jnp.float32)
    xi = jnp.asarray(rng.randn(2, 6, 4, 3), jnp.float32)
    wr = jnp.asarray(rng.randn(6, 5, 4, 3), jnp.float32)
    wi = jnp.asarray(rng.randn(6, 5, 4, 3), jnp.float32)

    def loss(xr, xi, wr, wi):
        o_r, o_i = contractions.contract_dense(
            (xr, xi), (wr, wi), return_parts=True
        )
        return jnp.sum(o_r ** 2) + jnp.sum(o_r * o_i)

    ref = jax.grad(loss, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    contractions.set_contraction_backend("pallas")
    try:
        got = jax.grad(loss, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    finally:
        contractions.set_contraction_backend("auto")
    for g_ref, g_got in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=2e-3, rtol=1e-4
        )


def test_mixed_precision_output_stays_bf16_with_bias():
    """Regression: an f32 bias must not promote the mixed-mode block
    output (and every downstream matmul) back to f32."""
    import jax

    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv

    conv = SpectralConv(
        in_channels=4, out_channels=4, n_modes=(8, 8),
        fno_block_precision="mixed", use_bias=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 16, 16), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    out = conv.apply(params, x)
    assert out.dtype == jnp.bfloat16
