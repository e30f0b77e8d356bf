"""CODANO / CODALayer tests (mirrors reference models/tests/test_codano.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.coda_layer import CODALayer
from neuraloperator_tpu.models import CODANO, extend_variable_ids


def test_coda_layer_forward():
    layer = CODALayer(
        n_modes=(4, 4), n_heads=2, token_codimension=2,
        per_channel_attention=False,
    )
    # 3 tokens of codim 2 -> 6 channels
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 12, 12))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y = layer.apply(variables, x)
    assert y.shape == x.shape


def test_coda_layer_permutation_equivariance():
    """Permutation-equivariant mode: permuting tokens permutes outputs."""
    layer = CODALayer(
        n_modes=(4, 4), n_heads=1, token_codimension=1,
        per_channel_attention=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 12, 12))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y = layer.apply(variables, x)
    perm = [2, 0, 1]
    y_perm = layer.apply(variables, x[:, perm])
    np.testing.assert_allclose(
        np.asarray(y[:, perm]), np.asarray(y_perm), rtol=2e-3, atol=2e-4
    )


def test_codano_forward_backward():
    model = CODANO(
        n_modes=((4, 4),) * 2,
        n_layers=2,
        hidden_variable_codimension=4,
        lifting_channels=8,
        projection_channels=8,
        per_channel_attention=False,
        attention_token_dim=1,
        domain_padding=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 3, 12, 12)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_codano_positional_encoding_and_cls():
    model = CODANO(
        n_modes=((4, 4),) * 2,
        n_layers=2,
        hidden_variable_codimension=4,
        lifting_channels=8,
        projection_channels=8,
        use_positional_encoding=True,
        positional_encoding_dim=2,
        variable_ids=("u", "v"),
        enable_cls_token=True,
        domain_padding=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 12))
    variables = model.init(
        jax.random.PRNGKey(1), x, input_variable_ids=["u", "v"]
    )
    y = model.apply(variables, x, input_variable_ids=["u", "v"])
    assert y.shape == (1, 2, 12, 12)


def test_codano_extend_variable_ids():
    """Runtime variable-set extension (reference codano.py:351-372).

    Extending a trained model to unseen variable ids must (a) leave
    outputs for the original variables bit-identical, (b) accept the new
    ids in forward, (c) add exactly one pos_enc param per new id.
    """
    model = CODANO(
        n_modes=((4, 4),) * 2,
        n_layers=2,
        hidden_variable_codimension=4,
        lifting_channels=8,
        projection_channels=8,
        use_positional_encoding=True,
        positional_encoding_dim=2,
        variable_ids=("u", "v"),
        domain_padding=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 12))
    params = model.init(
        jax.random.PRNGKey(1), x, input_variable_ids=["u", "v"]
    )["params"]
    y_before = model.apply(
        {"params": params}, x, input_variable_ids=["u", "v"]
    )

    ext_model, ext_params = extend_variable_ids(
        model, params, ["w", "v"], jax.random.PRNGKey(2)
    )
    assert ext_model.variable_ids == ("u", "v", "w")
    assert set(ext_params) - set(params) == {"pos_enc_w"}

    # (a) old-variable outputs unchanged (same leaves, same graph)
    y_after = ext_model.apply(
        {"params": ext_params}, x, input_variable_ids=["u", "v"]
    )
    np.testing.assert_array_equal(np.asarray(y_before), np.asarray(y_after))

    # (b) forward over the extended set, incl. the new id
    x3 = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 12, 12))
    y3 = ext_model.apply(
        {"params": ext_params}, x3, input_variable_ids=["u", "v", "w"]
    )
    assert y3.shape == (1, 3, 12, 12)
    assert np.all(np.isfinite(np.asarray(y3)))

    # (c) the new encoding is trainable: grads reach it
    g = jax.grad(
        lambda p: jnp.sum(
            ext_model.apply(
                {"params": p}, x3, input_variable_ids=["u", "v", "w"]
            )
            ** 2
        )
    )(ext_params)
    assert float(jnp.max(jnp.abs(g["pos_enc_w"]))) > 0

    # (d) duplicate ids within the request dedup cleanly (a repeat would
    # otherwise declare pos_enc_w twice -> flax NameInUseError on apply)
    dup_model, dup_params = extend_variable_ids(
        model, params, ["w", "w", "v"], jax.random.PRNGKey(4)
    )
    assert dup_model.variable_ids == ("u", "v", "w")
    y_dup = dup_model.apply(
        {"params": dup_params}, x3, input_variable_ids=["u", "v", "w"]
    )
    assert np.all(np.isfinite(np.asarray(y_dup)))
