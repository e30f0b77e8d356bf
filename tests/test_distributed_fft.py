"""Sharded-FFT spectral conv vs the single-device path, on a real 8-way mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuraloperator_tpu.layers.spectral_convolution import spectral_conv_forward
from neuraloperator_tpu.parallel import mesh as mesh_lib
from neuraloperator_tpu.parallel.distributed_fft import (
    distributed_spectral_conv2d,
    halo_exchange,
)
from neuraloperator_tpu.tensor.factorized import FactorizationSpec


def _single_device_reference(x, w, kept_h, kept_w):
    spec = FactorizationSpec("dense", tuple(w.shape))
    return spectral_conv_forward(
        x,
        spec,
        {"weight": w},
        bias=None,
        n_modes=[kept_h, kept_w],
        max_n_modes=[kept_h, kept_w],
        complex_data=False,
        separable=False,
        implementation="reconstructed",
        fft_norm="forward",
        fno_block_precision="full",
        enforce_hermitian_symmetry=False,
        resolution_scaling_factor=None,
        output_shape=None,
        out_channels=w.shape[1],
    )


def test_distributed_matches_single_device():
    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 16, 16), jnp.float32)
    kept_h, kept_w = 8, 5
    w_np = rng.randn(3, 4, kept_h, kept_w) + 1j * rng.randn(3, 4, kept_h, kept_w)

    def dist(x, w_st):
        w = jax.lax.complex(w_st[0], w_st[1])
        return distributed_spectral_conv2d(
            x, w, (kept_h, kept_w), mesh, axis_name="model"
        )

    w_st = jnp.asarray(
        np.stack([w_np.real, w_np.imag]), jnp.float32
    )
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "model", None)))
        out = jax.jit(dist)(xs, w_st)
    ref = _single_device_reference(
        x, jnp.asarray(w_np, jnp.complex64), kept_h, kept_w
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_distributed_gradients_flow():
    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 8, 8), jnp.float32)
    w_np = rng.randn(2, 2, 4, 3) + 1j * rng.randn(2, 2, 4, 3)
    w_st = jnp.asarray(np.stack([w_np.real, w_np.imag]), jnp.float32)

    def loss(w_st, x):
        w = jax.lax.complex(w_st[0], w_st[1])
        out = distributed_spectral_conv2d(x, w, (4, 3), mesh, "model")
        return jnp.sum(out ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(w_st, x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_halo_exchange():
    mesh = mesh_lib.init(model_parallel_size=8)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 1, 8, 4)

    def f(x):
        return halo_exchange(x, halo=1, axis_name="model")

    with mesh:
        fn = jax.shard_map(
            f, mesh=mesh,
            in_specs=P(None, None, "model", None),
            out_specs=P(None, None, "model", None),
        )
        out = fn(x)
    # each local row (1 high) becomes 3 rows: [prev, self, next] (circular)
    out = np.asarray(out)
    assert out.shape == (1, 1, 24, 4)
    np.testing.assert_allclose(out[0, 0, 1], np.asarray(x)[0, 0, 0])  # self
    np.testing.assert_allclose(out[0, 0, 0], np.asarray(x)[0, 0, 7])  # wrap
