"""Polyak/EMA parameter averaging carried in the optimizer state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw
from neuraloperator_tpu.training.optimizer import (
    ema_params,
    with_ema,
)


def test_ema_tracks_param_trajectory_exactly():
    """EMA folds the params passed to each update (= the previous step's
    applied result): robust to any post-``update`` scaling the caller
    does, with a one-step lag."""
    decay = 0.9
    opt = with_ema(optax.sgd(0.1), decay=decay)
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = opt.init(params)

    expected_ema = np.asarray(params["w"])
    for i in range(5):
        grads = {"w": jnp.asarray([0.5, -1.0]) * (i + 1)}
        pre_update = np.asarray(params["w"])
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        expected_ema = decay * expected_ema + (1 - decay) * pre_update
        np.testing.assert_allclose(
            np.asarray(ema_params(state)["w"]), expected_ema, rtol=1e-6
        )


def test_ema_correct_under_post_update_scaling():
    """The Trainer multiplies updates by its epoch scheduler's factor
    AFTER optimizer.update; the EMA must track the params actually
    applied, not p + unscaled_u."""
    decay = 0.5
    opt = with_ema(optax.sgd(0.1), decay=decay)
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = opt.init(params)

    expected_ema = np.asarray(params["w"])
    for i in range(4):
        grads = {"w": jnp.asarray([1.0, -2.0])}
        pre_update = np.asarray(params["w"])
        updates, state = opt.update(grads, state, params)
        # emulate Trainer's scheduler scaling (StepLR factor 0.5)
        updates = jax.tree_util.tree_map(lambda u: 0.5 * u, updates)
        params = optax.apply_updates(params, updates)
        expected_ema = decay * expected_ema + (1 - decay) * pre_update
        np.testing.assert_allclose(
            np.asarray(ema_params(state)["w"]), expected_ema, rtol=1e-6
        )


def test_ema_params_type_guard():
    opt = optax.sgd(0.1)
    state = opt.init({"w": jnp.zeros(3)})
    with pytest.raises(TypeError):
        ema_params(state)


def test_trainer_with_ema_smoothes():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 1, 8, 8)).astype(np.float32)
    y = (2.0 * x).astype(np.float32)
    loader = [{"x": x, "y": y}]

    trainer = Trainer(model=model, n_epochs=6)
    metrics = trainer.train(
        loader, {"test": loader}, with_ema(adamw(3e-3), decay=0.8),
    )
    assert np.isfinite(metrics["train_err"])

    ema = ema_params(trainer.opt_state)
    # the EMA lags the live params (they differ) but has the same pytree
    same_struct = jax.tree_util.tree_structure(
        ema
    ) == jax.tree_util.tree_structure(trainer.params)
    assert same_struct
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(ema),
            jax.tree_util.tree_leaves(trainer.params),
        )
    ]
    assert max(diffs) > 0.0

    # evaluating with the EMA weights works through the normal apply path
    out = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx)
    )(ema, jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()
