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


def test_fno_with_distributed_conv_module():
    """FNO(conv_module=DistributedSpectralConv2d) on a mesh matches the
    same params run through the single-device fallback."""
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.parallel.distributed_fft import (
        DistributedSpectralConv2d,
    )

    model = FNO(
        n_modes=(8, 8), in_channels=1, out_channels=1, hidden_channels=4,
        n_layers=2, conv_module=DistributedSpectralConv2d,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 1, 16, 16), jnp.float32
    )
    # init + reference forward with no active mesh (local fallback path)
    mesh_lib._CURRENT_MESH = None
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert params["fno_blocks"]["conv_0"]["w_weight"].shape == (2, 4, 4, 8, 5)
    ref = model.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=4)
    with mesh_lib.use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, None, None)))
        out = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, xs)
    mesh_lib._CURRENT_MESH = None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_distributed_conv_module_rejects_unsupported():
    from neuraloperator_tpu.parallel.distributed_fft import (
        DistributedSpectralConv2d,
    )

    conv = DistributedSpectralConv2d(
        in_channels=2, out_channels=2, n_modes=(4, 4), separable=True
    )
    x = jnp.zeros((1, 2, 8, 8))
    with pytest.raises(ValueError, match="does not support"):
        conv.init(jax.random.PRNGKey(0), x)


def test_fno_with_distributed_conv_trains_on_mesh():
    """One full DP train step through FNO(conv_module=DistributedSpectralConv2d):
    gradients flow through the all_to_all sharded-FFT path."""
    import optax

    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.losses import LpLoss
    from neuraloperator_tpu.parallel.distributed_fft import (
        DistributedSpectralConv2d,
    )

    model = FNO(
        n_modes=(8, 8), in_channels=1, out_channels=1, hidden_channels=4,
        n_layers=2, conv_module=DistributedSpectralConv2d,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(4, 1, 16, 16), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(4, 1, 16, 16), jnp.float32)
    mesh_lib._CURRENT_MESH = None
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    l2 = LpLoss(d=2)
    opt = optax.adamw(1e-3)

    # single-device reference gradients (no active mesh -> local fallback)
    def loss_fn_ref(q):
        return l2(model.apply({"params": q}, x), y)

    g_ref = jax.jit(jax.grad(loss_fn_ref))(params)

    mesh = mesh_lib.init(model_parallel_size=4)
    try:
        with mesh_lib.use_mesh(mesh):
            os_ = jax.device_put(
                opt.init(params), NamedSharding(mesh, P())
            )
            ps = jax.device_put(params, NamedSharding(mesh, P()))
            xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, 4))
            ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, 4))

            def step(p, s, xx, yy):
                def loss_fn(q):
                    return l2(model.apply({"params": q}, xx), yy)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                return optax.apply_updates(p, updates), s, loss, grads

            new_p, _, loss, grads = jax.jit(step)(ps, os_, xs, ys)
    finally:
        mesh_lib._CURRENT_MESH = None
    assert np.isfinite(float(loss))
    # gradient PARITY with the single-device path, not just finiteness:
    # check_vma=False removes the static checker, so a dropped/extra psum
    # in the shard_map transpose must be caught numerically here
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def _single_device_reference_3d(x, w, kd, kh, kw):
    spec = FactorizationSpec("dense", tuple(w.shape))
    return spectral_conv_forward(
        x,
        spec,
        {"weight": w},
        bias=None,
        n_modes=[kd, kh, kw],
        max_n_modes=[kd, kh, kw],
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


@pytest.mark.parametrize("kd,kh,kw", [(4, 4, 3), (5, 6, 4)])
def test_distributed_3d_matches_single_device(kd, kh, kw):
    from neuraloperator_tpu.parallel.distributed_fft import (
        distributed_spectral_conv3d,
    )

    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2, 8, 8, 10), jnp.float32)
    w_np = rng.randn(2, 3, kd, kh, kw) + 1j * rng.randn(2, 3, kd, kh, kw)

    def dist(x, w_st):
        w = jax.lax.complex(w_st[0], w_st[1])
        return distributed_spectral_conv3d(
            x, w, (kd, kh, kw), mesh, axis_name="model"
        )

    w_st = jnp.asarray(np.stack([w_np.real, w_np.imag]), jnp.float32)
    with mesh:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, None, "model", None))
        )
        out = jax.jit(dist)(xs, w_st)
    ref = _single_device_reference_3d(
        x, jnp.asarray(w_np, jnp.complex64), kd, kh, kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-5
    )


def test_distributed_3d_gradients_flow():
    from neuraloperator_tpu.parallel.distributed_fft import (
        distributed_spectral_conv3d,
    )

    mesh = mesh_lib.init(model_parallel_size=4)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 4, 8, 6), jnp.float32)
    w_st = jnp.asarray(rng.randn(2, 2, 2, 3, 4, 2), jnp.float32)

    def loss(w_st, x):
        w = jax.lax.complex(w_st[0], w_st[1])
        out = distributed_spectral_conv3d(x, w, (3, 4, 2), mesh, "model")
        return jnp.sum(out ** 2)

    def loss_ref(w_st, x):
        w = jax.lax.complex(w_st[0], w_st[1])
        out = _single_device_reference_3d(x, w, 3, 4, 2)
        return jnp.sum(out ** 2)

    with mesh:
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, None, "model", None))
        )
        g = jax.jit(jax.grad(loss))(w_st, xs)
    g_ref = jax.grad(loss_ref)(w_st, x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=2e-3
    )


def test_fno3d_with_distributed_conv_module():
    """FNO-3D(conv_module=DistributedSpectralConv3d) on a mesh matches the
    same params through the single-device fallback."""
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.parallel import DistributedSpectralConv3d

    model = FNO(
        n_modes=(4, 4, 4), in_channels=1, out_channels=1,
        hidden_channels=4, n_layers=2,
        conv_module=DistributedSpectralConv3d,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 8, 8, 8), jnp.float32
    )
    mesh_lib.init(model_parallel_size=1)  # local fallback
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y_local = model.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=4)
    with mesh_lib.use_mesh(mesh):
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, None, None, "model", None))
        )
        y_dist = jax.jit(
            lambda p, x: model.apply({"params": p}, x)
        )(params, xs)
    mesh_lib.init(model_parallel_size=1)
    np.testing.assert_allclose(
        np.asarray(y_dist), np.asarray(y_local), rtol=2e-4, atol=2e-4
    )
