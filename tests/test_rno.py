"""RNO tests (mirrors reference models/tests/test_rno.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.rno_block import RNOBlock, RNOCell
from neuraloperator_tpu.models import RNO


def test_rno_cell():
    cell = RNOCell(n_modes=(4, 4), hidden_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 12))
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 12))
    variables = cell.init(jax.random.PRNGKey(2), x, h)
    h2 = cell.apply(variables, x, h)
    assert h2.shape == h.shape


def test_rno_block_sequence():
    block = RNOBlock(
        n_modes=(4, 4), hidden_channels=8, return_sequences=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 12, 12))
    variables = block.init(jax.random.PRNGKey(1), x)
    out = block.apply(variables, x)
    assert out.shape == (2, 3, 8, 12, 12)
    block_last = RNOBlock(
        n_modes=(4, 4), hidden_channels=8, return_sequences=False
    )
    variables = block_last.init(jax.random.PRNGKey(1), x)
    out = block_last.apply(variables, x)
    assert out.shape == (2, 8, 12, 12)


def test_rno_forward_backward():
    model = RNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 1, 12, 12)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    unused = sum(
        1
        for leaf in jax.tree_util.tree_leaves(g)
        if not np.any(np.asarray(leaf) != 0)
    )
    assert unused == 0


def test_rno_input_validation():
    model = RNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=1,
    )
    bad = jnp.zeros((2, 1, 12, 12))  # missing time dim
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), bad)


def test_rno_predict_rollout():
    model = RNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=1, positional_embedding=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 8, 8))
    variables = model.init(jax.random.PRNGKey(1), x)
    rollout = model.predict(variables, x, num_steps=3)
    assert rollout.shape == (1, 3, 1, 8, 8)
