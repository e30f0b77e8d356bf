"""ZeRO-1 optimizer-state sharding: exactness + actual slicing.

The sharded-state schedule must change WHERE the state lives, never what
the optimizer computes — every test holds the ZeRO run to bit-level
agreement with the replicated run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.parallel import mesh as mesh_lib
from neuraloperator_tpu.parallel import zero as zero_lib
from neuraloperator_tpu.training.optimizer import adamw as factored_adamw


def _toy_problem():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 8, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    return model, params, x, y


def _run_steps(model, params, opt, opt_state, x, y, n_steps, specs=None,
               mesh=None):
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((model.apply({"params": p}, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        if specs is not None:
            opt_state = zero_lib.constrain(opt_state, specs, mesh)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step, donate_argnums=(0, 1))
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    return params, opt_state, loss


@pytest.mark.parametrize("make_opt", [
    lambda: optax.adamw(1e-3),
    lambda: factored_adamw(1e-3, factored_second_moment=True),
    lambda: factored_adamw(1e-3, factored_second_moment=True,
                           mu_dtype="int8"),
], ids=["adamw", "factored_adamw", "factored_adamw_int8mu"])
def test_zero_matches_replicated(make_opt):
    model, params, x, y = _toy_problem()
    mesh = mesh_lib.init(model_parallel_size=1)  # 8-way data parallel
    opt = make_opt()

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    state0 = opt.init(params)
    specs = zero_lib.zero_specs(state0, mesh)
    os_z = zero_lib.shard_opt_state(copy(state0), mesh)

    p_ref, _, loss_ref = _run_steps(
        model, copy(params), opt, state0, x, y, 3
    )

    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        p_z, os_out, loss_z = _run_steps(
            model, copy(params), opt, os_z, xs, y, 3, specs=specs, mesh=mesh
        )

    np.testing.assert_allclose(float(loss_z), float(loss_ref), rtol=1e-6)
    for (k, ref), (_, z) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_z),
    ):
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(ref), atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )

    # the state must actually be sharded: every leaf with a dim divisible
    # by 8 stores 1/8 of its elements per device
    n_sharded = 0
    for leaf, spec in zip(
        jax.tree_util.tree_leaves(os_out), jax.tree_util.tree_leaves(specs)
    ):
        if any(s == "data" for s in spec):
            shard = leaf.addressable_shards[0].data
            assert shard.size == leaf.size // 8
            n_sharded += 1
    assert n_sharded > 0


def test_zero_specs_shapes():
    mesh = mesh_lib.init(model_parallel_size=1)
    tree = {
        "scalar": jnp.float32(0.0),
        "odd": jnp.zeros((3, 5)),
        "vec": jnp.zeros((16,)),
        "mat": jnp.zeros((4, 64, 2)),
    }
    specs = zero_lib.zero_specs(tree, mesh)
    assert specs["scalar"] == P()
    assert specs["odd"] == P()        # nothing divisible by 8
    assert specs["vec"] == P("data")
    assert specs["mat"] == P(None, "data", None)  # largest divisible dim


def test_trainer_zero_sharding_matches():
    from neuraloperator_tpu.training import Trainer

    model, _, x, y = _toy_problem()
    loader = [{"x": np.asarray(x), "y": np.asarray(y)}]
    mesh = mesh_lib.init(model_parallel_size=1)

    results = {}
    for zero in (False, True):
        trainer = Trainer(
            model=model, n_epochs=2, mesh=mesh, zero_sharding=zero,
        )
        metrics = trainer.train(
            loader, {"test": loader}, optax.adamw(1e-3),
        )
        results[zero] = (metrics, trainer.params)

    for k in results[False][0]:
        if "time" in k:
            continue
        np.testing.assert_allclose(
            results[True][0][k], results[False][0][k], rtol=2e-5, err_msg=k
        )
    for (k, ref), (_, z) in zip(
        jax.tree_util.tree_leaves_with_path(results[False][1]),
        jax.tree_util.tree_leaves_with_path(results[True][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(ref), atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )


def test_zero_shards_ema_state():
    """with_ema rides the optimizer state, so ZeRO-1 shards the EMA copy
    too — each device stores 1/8 of every shardable EMA leaf."""
    from neuraloperator_tpu.training.optimizer import ema_params, with_ema

    model, params, x, y = _toy_problem()
    mesh = mesh_lib.init(model_parallel_size=1)
    opt = with_ema(optax.adamw(1e-3), decay=0.9)

    state0 = opt.init(params)
    specs = zero_lib.zero_specs(state0, mesh)
    os_z = zero_lib.shard_opt_state(state0, mesh)

    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        p_z, os_out, loss = _run_steps(
            model, params, opt, os_z, xs, y, 2, specs=specs, mesh=mesh
        )
    assert np.isfinite(float(loss))

    ema = ema_params(os_out)
    n_sharded = 0
    for leaf in jax.tree_util.tree_leaves(ema):
        spec = leaf.sharding.spec
        if any(s == "data" for s in spec):
            assert leaf.addressable_shards[0].data.size == leaf.size // 8
            n_sharded += 1
    assert n_sharded > 0
