"""Multi-device mesh tests on the virtual 8-device CPU backend.

What the reference cannot test in CI (it exercises NCCL paths only at world
size 1), we test for real: data-parallel training steps on a sharded batch
must match the single-device result, and tensor-parallel sharded spectral
weights must produce identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.parallel import mesh as mesh_lib


@pytest.fixture
def model_and_data():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 8, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 8, 8))
    variables = model.init(jax.random.PRNGKey(2), x)
    return model, variables["params"], x, y


def test_mesh_init_shapes():
    mesh = mesh_lib.init(model_parallel_size=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    assert mesh_lib.get_data_parallel_size() == 4
    assert mesh_lib.get_model_parallel_size() == 2


def test_data_parallel_loss_matches_single_device(model_and_data):
    model, params, x, y = model_and_data
    l2 = LpLoss(d=2, reduction="mean")

    def loss_fn(p, xx, yy):
        return l2(model.apply({"params": p}, xx), yy)

    ref = jax.jit(loss_fn)(params, x, y)

    mesh = mesh_lib.init(model_parallel_size=1)
    with mesh:
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, y.ndim))
        ps = mesh_lib.replicate(params, mesh)
        sharded = jax.jit(loss_fn)(ps, xs, ys)
    np.testing.assert_allclose(float(ref), float(sharded), rtol=1e-5)


def test_data_parallel_grads_match(model_and_data):
    model, params, x, y = model_and_data
    l2 = LpLoss(d=2, reduction="mean")

    def loss_fn(p, xx, yy):
        return l2(model.apply({"params": p}, xx), yy)

    g_ref = jax.jit(jax.grad(loss_fn))(params, x, y)

    mesh = mesh_lib.init(model_parallel_size=1)
    with mesh:
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, y.ndim))
        ps = mesh_lib.replicate(params, mesh)
        g_sharded = jax.jit(jax.grad(loss_fn))(ps, xs, ys)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sharded)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_tensor_parallel_spectral_weights(model_and_data):
    """Out-channel-sharded spectral weights compute identical outputs."""
    model, params, x, y = model_and_data
    mesh = mesh_lib.init(model_parallel_size=2)
    ref = model.apply({"params": params}, x)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, v: model.apply({"params": p}, v))(ps, xs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=1e-5
    )


def test_full_train_step_on_mesh(model_and_data):
    """One DP+TP train step compiles and runs on a 4x2 mesh."""
    import optax

    model, params, x, y = model_and_data
    l2 = LpLoss(d=2)
    opt = optax.adamw(1e-3)
    mesh = mesh_lib.init(model_parallel_size=2)

    def step(p, o, xx, yy):
        def loss_fn(pp):
            return l2(model.apply({"params": pp}, xx), yy)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        os_ = jax.device_put(opt.init(params), NamedSharding(mesh, P()))
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, y.ndim))
        new_p, new_o, loss = jax.jit(step)(ps, os_, xs, ys)
    assert np.isfinite(float(loss))


def test_tp_specs_identify_factorizations():
    """tp_param_specs shards the out-channel factor of each factorization."""
    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv

    mesh = mesh_lib.init(model_parallel_size=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    for fact, leafname, dim in (
        (None, "w_weight", 2),
        ("cp", "w_factor_1", 1),
        ("tucker", "w_factor_1", 1),
        ("tt", "w_factor_1", 2),
    ):
        conv = SpectralConv(
            in_channels=8, out_channels=8, n_modes=(4, 4),
            factorization=fact, rank=0.5,
        )
        params = conv.init(jax.random.PRNGKey(1), x)["params"]
        specs = mesh_lib.tp_param_specs(params, mesh)
        spec = specs[leafname].spec
        assert spec[dim] == "model", (fact, leafname, spec)
        for j, s in enumerate(spec):
            if j != dim:
                assert s is None


@pytest.mark.parametrize("factorization", ["tucker", "cp"])
def test_tensor_parallel_tfno_factorized(factorization):
    """TP-sharded factorized (TFNO-style) weights match single device."""
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2, factorization=factorization, rank=0.4,
        implementation="factorized",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    ref = model.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        out = jax.jit(lambda p, v: model.apply({"params": p}, v))(ps, xs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=1e-5
    )


def test_tfno_dp_grads_match():
    """DP grads of a factorized TFNO match the single-device grads."""
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2, factorization="tucker", rank=0.4,
        implementation="factorized",
    )
    l2 = LpLoss(d=2, reduction="mean")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 8, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(2), x)["params"]

    def loss_fn(p, xx, yy):
        return l2(model.apply({"params": p}, xx), yy)

    g_ref = jax.jit(jax.grad(loss_fn))(params, x, y)
    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, y.ndim))
        g = jax.jit(jax.grad(loss_fn))(ps, xs, ys)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_sfno_on_mesh_matches_single_device():
    from neuraloperator_tpu.models import SFNO

    model = SFNO(
        n_modes=(8, 8), in_channels=2, out_channels=2, hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 16, 32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        out = jax.jit(lambda p, v: model.apply({"params": p}, v))(ps, xs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=1e-5
    )


def test_gino_on_mesh_matches_single_device():
    from neuraloperator_tpu.models import GINO

    rng = np.random.RandomState(0)
    n_in, n_out, d = 40, 16, 3
    input_geom = jnp.asarray(rng.rand(1, n_in, d), jnp.float32)
    axes = [jnp.linspace(0, 1, 4)] * d
    latent_queries = jnp.stack(
        jnp.meshgrid(*axes, indexing="ij"), axis=-1
    )[None]
    output_queries = jnp.asarray(rng.rand(1, n_out, d), jnp.float32)
    x = jnp.asarray(rng.rand(4, n_in, 4), jnp.float32)

    model = GINO(
        in_channels=4, out_channels=2, gno_coord_dim=d,
        in_gno_radius=0.4, out_gno_radius=0.4, fno_in_channels=4,
        fno_n_modes=(4, 4, 4), fno_hidden_channels=8, fno_n_layers=1,
        gno_max_neighbors=16,
        in_gno_channel_mlp_hidden_layers=(16,),
        out_gno_channel_mlp_hidden_layers=(16,),
    )
    params = model.init(
        jax.random.PRNGKey(0), input_geom, latent_queries, output_queries, x
    )["params"]
    ref = model.apply(
        {"params": params}, input_geom, latent_queries, output_queries, x
    )

    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        out = jax.jit(
            lambda p, v: model.apply(
                {"params": p}, input_geom, latent_queries, output_queries, v
            )
        )(ps, xs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-3, atol=1e-4
    )


def test_make_distributed_batch_multiprocess_branch(monkeypatch):
    """Drive the jax.make_array_from_process_local_data branch (unreachable
    at real process_count()==1): with every device addressable, the
    process-local data is the full global batch and the result must equal
    the single-process shard_batch output."""
    mesh = mesh_lib.init(model_parallel_size=2)
    batch = {
        "x": np.random.RandomState(0).randn(8, 1, 4, 4).astype(np.float32),
        "y": np.random.RandomState(1).randn(8, 1, 4, 4).astype(np.float32),
    }
    ref = mesh_lib.shard_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, mesh
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = mesh_lib.make_distributed_batch(batch, mesh)
    for k in batch:
        assert out[k].sharding == ref[k].sharding
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


@pytest.mark.parametrize("family", ["uno", "rno", "codano", "local_no"])
def test_remaining_families_on_mesh_match_single_device(family):
    """Every model family computes identical outputs on the 4x2 mesh."""
    if family == "uno":
        from neuraloperator_tpu.models import UNO

        model = UNO(
            in_channels=2, out_channels=1, hidden_channels=16,
            lifting_channels=32, projection_channels=32, n_layers=5,
            uno_out_channels=(8, 16, 16, 16, 8),
            uno_n_modes=((4, 4),) * 5,
            uno_scalings=((1.0, 1.0), (0.5, 0.5), (1, 1), (2, 2), (1, 1)),
            channel_mlp_skip="linear",
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 16, 16))
    elif family == "rno":
        from neuraloperator_tpu.models import RNO

        model = RNO(
            n_modes=(4, 4), in_channels=1, out_channels=1,
            hidden_channels=8, n_layers=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 1, 12, 12))
    elif family == "codano":
        from neuraloperator_tpu.models import CODANO

        model = CODANO(
            n_modes=((4, 4),) * 2, n_layers=2,
            hidden_variable_codimension=4, lifting_channels=8,
            projection_channels=8, per_channel_attention=False,
            attention_token_dim=1, domain_padding=None,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 12, 12))
    else:
        from neuraloperator_tpu.models import LocalNO

        model = LocalNO(
            n_modes=(6, 6), in_channels=2, out_channels=1,
            hidden_channels=8, default_in_shape=(16, 16), n_layers=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 16, 16))

    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)

    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        ps = mesh_lib.shard_params(params, mesh)
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
        out = jax.jit(lambda p, v: model.apply({"params": p}, v))(ps, xs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=5e-4, atol=5e-5
    )


def test_gino_point_sharded_matches_single_device():
    """Point-axis spatial model parallelism (parallel/distributed_gno.py):
    latent grid + output queries + their padded neighborhoods sharded over
    'model' must reproduce the replicated forward and its gradients."""
    from neuraloperator_tpu.layers.neighbor_search import (
        padded_neighbor_search,
    )
    from neuraloperator_tpu.models import GINO
    from neuraloperator_tpu.parallel.distributed_gno import (
        shard_gino_inputs,
    )

    rng = np.random.RandomState(3)
    n_in, n_out, d = 40, 16, 3
    input_geom = jnp.asarray(rng.rand(1, n_in, d), jnp.float32)
    axes = [jnp.linspace(0, 1, 4)] * d
    latent_queries = jnp.stack(
        jnp.meshgrid(*axes, indexing="ij"), axis=-1
    )[None]
    output_queries = jnp.asarray(rng.rand(1, n_out, d), jnp.float32)
    x = jnp.asarray(rng.rand(2, n_in, 4), jnp.float32)
    lq_flat = latent_queries.reshape(-1, d)
    in_nbrs = padded_neighbor_search(input_geom[0], lq_flat, 0.4, 16)
    out_nbrs = padded_neighbor_search(lq_flat, output_queries[0], 0.4, 16)

    model = GINO(
        in_channels=4, out_channels=2, gno_coord_dim=d,
        in_gno_radius=0.4, out_gno_radius=0.4, fno_in_channels=4,
        fno_n_modes=(4, 4, 4), fno_hidden_channels=8, fno_n_layers=1,
        gno_max_neighbors=16,
        in_gno_channel_mlp_hidden_layers=(16,),
        out_gno_channel_mlp_hidden_layers=(16,),
    )
    args = (input_geom, latent_queries, output_queries, x)
    kw = {"in_neighbors": in_nbrs, "out_neighbors": out_nbrs}
    params = model.init(jax.random.PRNGKey(0), *args, **kw)["params"]

    def loss(p, lq, oq, inn, onn):
        out = model.apply(
            {"params": p}, input_geom, lq, oq, x,
            in_neighbors=inn, out_neighbors=onn,
        )
        return jnp.sum(out ** 2), out

    (ref_loss, ref_out), ref_g = jax.value_and_grad(loss, has_aux=True)(
        params, latent_queries, output_queries, in_nbrs, out_nbrs
    )

    mesh = mesh_lib.init(model_parallel_size=2)
    with mesh:
        lq_s, oq_s, inn_s, onn_s = shard_gino_inputs(
            mesh,
            latent_queries=latent_queries,
            output_queries=output_queries,
            in_neighbors=in_nbrs,
            out_neighbors=out_nbrs,
        )
        (s_loss, s_out), s_g = jax.jit(
            jax.value_and_grad(loss, has_aux=True)
        )(params, lq_s, oq_s, inn_s, onn_s)
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(s_out), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(ref_loss), float(s_loss), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_g), jax.tree_util.tree_leaves(s_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
        )


def test_shard_points_divisibility_error():
    from neuraloperator_tpu.parallel.distributed_gno import shard_points

    mesh = mesh_lib.init(model_parallel_size=2)
    pts = jnp.zeros((1, 15, 3))
    with pytest.raises(ValueError, match="not divisible"):
        shard_points(pts, mesh)
