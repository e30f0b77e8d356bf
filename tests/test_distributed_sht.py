"""Latitude-sharded SHT spherical conv vs the single-device path (8-way mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuraloperator_tpu.layers.spherical_convolution import contract_dhconv
from neuraloperator_tpu.ops.sht import isht, sht
from neuraloperator_tpu.parallel import mesh as mesh_lib
from neuraloperator_tpu.parallel.distributed_sht import (
    DistributedSphericalConv,
    distributed_spherical_conv,
)


def _single_device_reference(x, w, lmax, mmax, grid):
    flm = sht(x, lmax=lmax, mmax=mmax, grid=grid)
    out = contract_dhconv(flm, w)
    return isht(out, nlat=x.shape[-2], nlon=x.shape[-1], grid=grid)


@pytest.mark.parametrize("grid", ["equiangular", "legendre-gauss"])
@pytest.mark.parametrize("lmax,mmax", [(8, 6), (12, 9)])
def test_distributed_sht_matches_single_device(grid, lmax, mmax):
    """mmax=6 divides the 4-way axis unevenly (pads to 8); mmax=9 pads to 12."""
    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 16, 24), jnp.float32)
    w_np = rng.randn(3, 4, lmax) + 1j * rng.randn(3, 4, lmax)
    w = jnp.asarray(w_np, jnp.complex64)

    def dist(x, w_st):
        return distributed_spherical_conv(
            x, jax.lax.complex(w_st[0], w_st[1]), lmax, mmax, mesh, grid=grid
        )

    w_st = jnp.asarray(np.stack([w_np.real, w_np.imag]), jnp.float32)
    with mesh:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, "model", None))
        )
        out = jax.jit(dist)(xs, w_st)
    ref = _single_device_reference(x, w, lmax, mmax, grid)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_distributed_sht_differentiates():
    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 8, 16), jnp.float32)
    lmax, mmax = 6, 5
    w_st = jnp.asarray(rng.randn(2, 2, 3, lmax), jnp.float32)

    def loss(w_st, x):
        y = distributed_spherical_conv(
            x, jax.lax.complex(w_st[0], w_st[1]), lmax, mmax, mesh
        )
        return jnp.sum(y * y)

    def loss_ref(w_st, x):
        w = jax.lax.complex(w_st[0], w_st[1])
        y = _single_device_reference(x, w, lmax, mmax, "equiangular")
        return jnp.sum(y * y)

    with mesh:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, "model", None))
        )
        g = jax.jit(jax.grad(loss))(w_st, xs)
    g_ref = jax.grad(loss_ref)(w_st, x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=2e-3
    )


def test_module_params_run_with_and_without_mesh():
    """The same param tree produces the same output on and off the mesh."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 16, 24), jnp.float32)
    conv = DistributedSphericalConv(
        in_channels=3, out_channels=3, n_modes=(8, 12)
    )

    mesh_lib.init(model_parallel_size=1)  # model axis 1 -> local fallback
    params = conv.init(jax.random.PRNGKey(0), x)["params"]
    y_local = conv.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=4)
    with mesh:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, "model", None))
        )
        y_dist = jax.jit(
            lambda p, x: conv.apply({"params": p}, x)
        )(params, xs)
    mesh_lib.init(model_parallel_size=1)
    np.testing.assert_allclose(
        np.asarray(y_dist), np.asarray(y_local), rtol=2e-4, atol=2e-4
    )


def test_module_rejects_unsupported_config():
    with pytest.raises(ValueError, match="does not support"):
        DistributedSphericalConv(
            in_channels=2, out_channels=2, n_modes=(4, 4),
            factorization="cp",
        ).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8), jnp.float32)
        )


def test_sfno_with_distributed_conv_module():
    """SFNO(conv_module=DistributedSphericalConv) runs forward + grad on a
    4-way model-parallel mesh (latitude sharded through every layer)."""
    import jax.numpy as jnp

    from neuraloperator_tpu.models import SFNO

    mesh = mesh_lib.init(model_parallel_size=4)
    model = SFNO(
        n_modes=(8, 8), in_channels=1, out_channels=1,
        hidden_channels=8, n_layers=2,
        conv_module=DistributedSphericalConv,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 16, 16), jnp.float32
    )
    with mesh_lib.use_mesh(mesh):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, "model", None))
        )
        y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, xs)
        g = jax.jit(
            jax.grad(
                lambda p, x: jnp.sum(model.apply({"params": p}, x) ** 2)
            )
        )(params, xs)
    mesh_lib.init(model_parallel_size=1)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(g)
    )
