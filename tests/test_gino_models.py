"""GINO and FNOGNO model tests (mirrors reference models/tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.models import FNOGNO, GINO


def _latent_grid(n, d):
    axes = [jnp.linspace(0, 1, n)] * d
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid[None]  # (1, n, ..., n, d)


def test_gino_forward_backward():
    rng = np.random.RandomState(0)
    n_in, n_out, d = 60, 25, 3
    input_geom = jnp.asarray(rng.rand(1, n_in, d), jnp.float32)
    latent_queries = _latent_grid(6, d)
    output_queries = jnp.asarray(rng.rand(1, n_out, d), jnp.float32)
    x = jnp.asarray(rng.rand(2, n_in, 4), jnp.float32)

    # 'linear' in-GNO kernels multiply by f_y pointwise, so the GNO output
    # width must equal in_channels (the reference has the same constraint)
    model = GINO(
        in_channels=4,
        out_channels=2,
        gno_coord_dim=d,
        in_gno_radius=0.4,
        out_gno_radius=0.4,
        fno_in_channels=4,
        fno_n_modes=(4, 4, 4),
        fno_hidden_channels=8,
        fno_n_layers=2,
        gno_max_neighbors=16,
        in_gno_channel_mlp_hidden_layers=(16, 16),
        out_gno_channel_mlp_hidden_layers=(16, 16),
    )
    variables = model.init(
        jax.random.PRNGKey(0), input_geom, latent_queries, output_queries, x
    )
    out = model.apply(variables, input_geom, latent_queries, output_queries, x)
    assert out.shape == (2, n_out, 2)

    g = jax.grad(
        lambda p: jnp.sum(
            model.apply(
                {"params": p}, input_geom, latent_queries, output_queries, x
            )
            ** 2
        )
    )(variables["params"])
    n_unused = sum(
        1
        for leaf in jax.tree_util.tree_leaves(g)
        if not np.any(np.asarray(leaf) != 0)
    )
    assert n_unused == 0


def test_gino_dict_queries():
    rng = np.random.RandomState(0)
    d = 3
    input_geom = jnp.asarray(rng.rand(1, 40, d), jnp.float32)
    latent_queries = _latent_grid(5, d)
    output_queries = {
        "a": jnp.asarray(rng.rand(1, 10, d), jnp.float32),
        "b": jnp.asarray(rng.rand(1, 7, d), jnp.float32),
    }
    x = jnp.asarray(rng.rand(1, 40, 3), jnp.float32)
    model = GINO(
        in_channels=3,
        out_channels=1,
        gno_coord_dim=d,
        in_gno_radius=0.5,
        out_gno_radius=0.5,
        fno_n_modes=(4, 4, 4),
        fno_hidden_channels=8,
        fno_n_layers=1,
        gno_max_neighbors=8,
        in_gno_channel_mlp_hidden_layers=(16,),
        out_gno_channel_mlp_hidden_layers=(16,),
    )
    variables = model.init(
        jax.random.PRNGKey(0), input_geom, latent_queries, output_queries, x
    )
    out = model.apply(variables, input_geom, latent_queries, output_queries, x)
    assert set(out) == {"a", "b"}
    assert out["a"].shape == (1, 10, 1)
    assert out["b"].shape == (1, 7, 1)


@pytest.mark.parametrize("batched", [False, True])
def test_fnogno_forward_backward(batched):
    rng = np.random.RandomState(0)
    d = 3
    n_grid, n_out = 6, 20
    axes = [jnp.linspace(0, 1, n_grid)] * d
    in_p = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    out_p = jnp.asarray(rng.rand(n_out, d), jnp.float32)
    if batched:
        f = jnp.asarray(rng.rand(2, n_grid, n_grid, n_grid, 3), jnp.float32)
    else:
        f = jnp.asarray(rng.rand(n_grid, n_grid, n_grid, 3), jnp.float32)

    model = FNOGNO(
        in_channels=3,
        out_channels=2,
        gno_coord_dim=d,
        gno_radius=0.4,
        fno_n_modes=(4, 4, 4),
        fno_hidden_channels=8,
        fno_n_layers=2,
        gno_max_neighbors=16,
        gno_channel_mlp_hidden_layers=(16, 16),
        gno_batched=batched,
    )
    variables = model.init(jax.random.PRNGKey(0), in_p, out_p, f)
    out = model.apply(variables, in_p, out_p, f)
    if batched:
        assert out.shape == (2, n_out, 2)
    else:
        assert out.shape == (n_out, 2)
    g = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, in_p, out_p, f) ** 2)
    )(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gino_ada_in():
    rng = np.random.RandomState(0)
    d = 3
    input_geom = jnp.asarray(rng.rand(1, 30, d), jnp.float32)
    latent_queries = _latent_grid(5, d)
    output_queries = jnp.asarray(rng.rand(1, 12, d), jnp.float32)
    x = jnp.asarray(rng.rand(1, 30, 3), jnp.float32)
    ada = jnp.asarray([0.5])
    model = GINO(
        in_channels=3,
        out_channels=1,
        gno_coord_dim=d,
        in_gno_radius=0.5,
        out_gno_radius=0.5,
        fno_n_modes=(4, 4, 4),
        fno_hidden_channels=8,
        fno_n_layers=1,
        fno_norm="ada_in",
        gno_max_neighbors=8,
        in_gno_channel_mlp_hidden_layers=(16,),
        out_gno_channel_mlp_hidden_layers=(16,),
    )
    variables = model.init(
        jax.random.PRNGKey(0), input_geom, latent_queries, output_queries, x,
        ada_in=ada,
    )
    out1 = model.apply(
        variables, input_geom, latent_queries, output_queries, x, ada_in=ada
    )
    out2 = model.apply(
        variables, input_geom, latent_queries, output_queries, x,
        ada_in=ada * 3,
    )
    assert out1.shape == (1, 12, 1)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
