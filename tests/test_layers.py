"""Utility-layer tests: embeddings, padding, resample, norms, skips, MLP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.channel_mlp import ChannelMLP, LinearChannelMLP
from neuraloperator_tpu.layers.embeddings import (
    GridEmbedding2D,
    GridEmbeddingND,
    SinusoidalEmbedding,
)
from neuraloperator_tpu.layers.normalization_layers import (
    AdaIN,
    GroupNorm,
    InstanceNorm,
)
from neuraloperator_tpu.layers.padding import DomainPadding
from neuraloperator_tpu.layers.resample import resample
from neuraloperator_tpu.layers.skip_connections import skip_connection


def test_grid_embedding_2d():
    emb = GridEmbedding2D(in_channels=3)
    x = jnp.zeros((2, 3, 8, 6))
    out = emb(x)
    assert out.shape == (2, 5, 8, 6)
    # x-coordinate channel varies along dim -2, constant along -1
    xc = np.asarray(out[0, 3])
    assert np.allclose(xc[:, 0], xc[:, -1])
    assert xc[0, 0] == 0.0 and xc[-1, 0] == pytest.approx(1 - 1 / 8)


def test_grid_embedding_nd():
    emb = GridEmbeddingND(in_channels=2, dim=3, grid_boundaries=[[0, 1]] * 3)
    x = jnp.zeros((1, 2, 4, 5, 6))
    assert emb(x).shape == (1, 5, 4, 5, 6)


def test_sinusoidal_embedding():
    emb = SinusoidalEmbedding(in_channels=3, num_frequencies=4,
                              embedding_type="transformer")
    coords = jnp.ones((2, 10, 3))
    out = emb(coords)
    assert out.shape == (2, 10, emb.out_channels)
    assert emb.out_channels == 2 * 3 * 4


@pytest.mark.parametrize("pad", [0.25, [0.25, 0.125]])
def test_domain_padding_roundtrip(pad):
    dp = DomainPadding(domain_padding=pad)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    padded = dp.pad(x)
    assert padded.shape[-2] == 16 + 2 * round(
        (pad[0] if isinstance(pad, list) else pad) * 16
    )
    restored = dp.unpad(padded)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x))


def test_resample_1d_linear_exact_on_linear_fn():
    x = jnp.linspace(0, 1, 9)[None, None]  # (1,1,9), linear function
    up = resample(x, 2.0, axis=[2])
    expected = np.linspace(0, 1, 18, endpoint=True)  # round(9*2) = 18 points
    np.testing.assert_allclose(np.asarray(up)[0, 0], expected, atol=1e-6)


def test_resample_2d_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 12))
    up = resample(x, 2.0, axis=[2, 3])
    assert up.shape == (2, 3, 24, 24)
    down = resample(x, 0.5, axis=[2, 3])
    assert down.shape == (2, 3, 6, 6)


def test_resample_3d_spectral_bandlimited_exact():
    """Spectral resampling reproduces band-limited signals exactly."""
    n = 16
    xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    f = np.sin(2 * X) * np.cos(Y) + np.cos(3 * Z)
    x = jnp.asarray(f)[None, None]
    up = resample(x, 2.0, axis=[2, 3, 4])
    xs2 = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    X2, Y2, Z2 = np.meshgrid(xs2, xs2, xs2, indexing="ij")
    f2 = np.sin(2 * X2) * np.cos(Y2) + np.cos(3 * Z2)
    assert np.abs(np.asarray(up)[0, 0] - f2).max() < 1e-4


def test_instance_norm():
    norm = InstanceNorm()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 5 + 2
    y = norm.apply({}, x)
    arr = np.asarray(y)
    assert np.abs(arr.mean(axis=(2, 3))).max() < 1e-5
    assert np.abs(arr.std(axis=(2, 3)) - 1).max() < 1e-2


def test_group_norm():
    norm = GroupNorm(num_groups=1, num_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    variables = norm.init(jax.random.PRNGKey(1), x)
    y = norm.apply(variables, x)
    assert y.shape == x.shape


def test_ada_in():
    norm = AdaIN(embed_dim=6, in_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    emb = jax.random.normal(jax.random.PRNGKey(1), (6,))
    variables = norm.init(jax.random.PRNGKey(2), x, emb)
    y = norm.apply(variables, x, emb)
    assert y.shape == x.shape
    y2 = norm.apply(variables, x, emb * 2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


@pytest.mark.parametrize("skip_type", ["identity", "linear", "soft-gating"])
def test_skip_connections(skip_type):
    mod = skip_connection(4, 4, n_dim=2, skip_type=skip_type)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 6))
    variables = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(variables, x)
    assert y.shape == x.shape
    if skip_type == "identity":
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    if skip_type == "soft-gating":
        # init weight is ones -> identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_channel_mlp_resolution_invariance():
    mlp = ChannelMLP(in_channels=3, out_channels=5, hidden_channels=8)
    x8 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    variables = mlp.init(jax.random.PRNGKey(1), x8)
    y8 = mlp.apply(variables, x8)
    assert y8.shape == (2, 5, 8, 8)
    x16 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    y16 = mlp.apply(variables, x16)
    assert y16.shape == (2, 5, 16, 16)


def test_linear_channel_mlp():
    mlp = LinearChannelMLP(layers=[4, 16, 2])
    x = jax.random.normal(jax.random.PRNGKey(0), (10, 4))
    variables = mlp.init(jax.random.PRNGKey(1), x)
    assert mlp.apply(variables, x).shape == (10, 2)
