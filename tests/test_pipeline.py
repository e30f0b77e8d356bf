"""Pipeline parallelism (GPipe over the 'model' axis) on the 8-device mesh.

The reference has no pipeline parallelism; these tests hold the TPU-native
implementation to the only standard that matters: the pipelined program
must match the single-device forward and gradients exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.parallel import mesh as mesh_lib
from neuraloperator_tpu.parallel.pipeline import gpipe, pipelined_fno_forward


def test_gpipe_schedule_matches_sequential():
    """A toy 4-stage pipeline (y = x * w0*w1*w2*w3) equals the sequential product."""
    mesh = mesh_lib.init(model_parallel_size=4)
    n_stages = mesh.shape["model"]
    weights = jnp.asarray([2.0, 3.0, 5.0, 7.0])  # one scalar per stage
    x_mb = jnp.asarray(
        np.random.RandomState(0).randn(6, 2, 3), jnp.float32
    )  # 6 microbatches

    def stage_fn(w, x):
        return x * w[0]  # local shard of weights has shape [1]

    fn = jax.shard_map(
        lambda w, xmb: gpipe(stage_fn, w, xmb, n_stages=n_stages),
        mesh=mesh,
        in_specs=(P("model"), P(None, "data")),
        out_specs=P(None, "data"),
        check_vma=False,
    )
    y = jax.jit(fn)(weights, x_mb)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x_mb) * float(jnp.prod(weights)), rtol=1e-6
    )


@pytest.fixture
def scan_fno_and_data():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=4, scan_layers=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    return model, params, x


def test_pipelined_fno_forward_matches_local(scan_fno_and_data):
    model, params, x = scan_fno_and_data
    mesh = mesh_lib.init(model_parallel_size=4)  # 2 data x 4 stages

    ref = jax.jit(lambda p, xx: model.apply({"params": p}, xx))(params, x)
    out = jax.jit(
        lambda p, xx: pipelined_fno_forward(
            model, p, xx, mesh, n_microbatches=4
        )
    )(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_fno_grads_match_local(scan_fno_and_data):
    model, params, x = scan_fno_and_data
    mesh = mesh_lib.init(model_parallel_size=4)
    y = jax.random.normal(jax.random.PRNGKey(2), (8, 1, 8, 8))

    def loss_local(p):
        return jnp.mean((model.apply({"params": p}, x) - y) ** 2)

    def loss_pipe(p):
        out = pipelined_fno_forward(model, p, x, mesh, n_microbatches=4)
        return jnp.mean((out - y) ** 2)

    g_ref = jax.jit(jax.grad(loss_local))(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pipe = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_pipe)
    }
    assert len(flat_ref) == len(flat_pipe)
    for key, ref_leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pipe[jax.tree_util.keystr(key)]),
            np.asarray(ref_leaf),
            atol=3e-5,
            err_msg=jax.tree_util.keystr(key),
        )


def test_pipelined_fno_validates_config():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=3, scan_layers=True,
    )
    x = jnp.zeros((4, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mesh = mesh_lib.init(model_parallel_size=4)
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_fno_forward(model, params, x, mesh, n_microbatches=2)

    unrolled = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=4,
    )
    uparams = unrolled.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="scan_layers"):
        pipelined_fno_forward(unrolled, uparams, x, mesh, n_microbatches=2)


def test_pipeline_with_zero_train_step(scan_fno_and_data):
    """dp x pp x ZeRO-1 composed: pipelined forward over 'model', grads
    reduced over 'data', optimizer state sharded 1/2 over 'data' — the
    parameter trajectory must match the plain single-device step."""
    import optax

    from neuraloperator_tpu.parallel import zero as zero_lib

    model, params, x = scan_fno_and_data
    mesh = mesh_lib.init(model_parallel_size=4)  # 2 data x 4 stages
    y = jax.random.normal(jax.random.PRNGKey(3), (8, 1, 8, 8))
    opt = optax.adamw(1e-3)

    state0 = opt.init(params)
    specs = zero_lib.zero_specs(state0, mesh)

    def make_step(pipelined):
        def step(p, os, xx, yy):
            def loss_fn(p):
                out = (
                    pipelined_fno_forward(
                        model, p, xx, mesh, n_microbatches=4
                    )
                    if pipelined
                    else model.apply({"params": p}, xx)
                )
                return jnp.mean((out - yy) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, os = opt.update(grads, os, p)
            if pipelined:
                os = zero_lib.constrain(os, specs, mesh)
            import optax as _optax

            return _optax.apply_updates(p, updates), os, loss

        return jax.jit(step)

    p_ref, os_ref, _ = make_step(False)(params, state0, x, y)
    p_ref, _, loss_ref = make_step(False)(p_ref, os_ref, x, y)

    with mesh:
        os_z = zero_lib.shard_opt_state(opt.init(params), mesh)
        pstep = make_step(True)
        p_z, os_z, _ = pstep(params, os_z, x, y)
        p_z, os_z, loss_z = pstep(p_z, os_z, x, y)

    np.testing.assert_allclose(float(loss_z), float(loss_ref), rtol=1e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_z),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=jax.tree_util.keystr(k),
        )

    # the sharded state is genuinely 1/2 per device on 'data'
    n_sharded = sum(
        1
        for leaf, spec in zip(
            jax.tree_util.tree_leaves(os_z), jax.tree_util.tree_leaves(specs)
        )
        if any(s == "data" for s in spec)
        and leaf.addressable_shards[0].data.size == leaf.size // 2
    )
    assert n_sharded > 0
