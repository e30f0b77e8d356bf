"""UNO model tests (mirrors reference models/tests/test_uno.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.models import UNO


def _uno(**kw):
    base = dict(
        in_channels=2,
        out_channels=1,
        hidden_channels=16,
        lifting_channels=32,
        projection_channels=32,
        n_layers=5,
        uno_out_channels=(8, 16, 16, 16, 8),
        uno_n_modes=((4, 4),) * 5,
        uno_scalings=((1.0, 1.0), (0.5, 0.5), (1, 1), (2, 2), (1, 1)),
        # soft-gating requires in==out channels; UNO mixes widths, so use
        # linear skips (the reference's UNO tests do the same)
        channel_mlp_skip="linear",
    )
    base.update(kw)
    return UNO(**base)


def test_uno_forward_backward():
    model = _uno()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 1, 16, 16)

    grads = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    unused = [
        1
        for leaf in jax.tree_util.tree_leaves(grads)
        if not np.any(np.asarray(leaf) != 0)
    ]
    assert not unused


def test_uno_resolution_change():
    """End-to-end scaling product != 1 changes the output resolution."""
    model = _uno(uno_scalings=((1, 1), (0.5, 0.5), (1, 1), (1, 1), (1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 8, 8)


def test_uno_custom_skip_map():
    model = _uno(horizontal_skips_map={4: 0, 3: 1})
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 16, 16)
