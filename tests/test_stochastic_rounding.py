"""Stochastic rounding for bf16 master parameters.

The mechanism must be (a) unbiased, (b) exact on representable values,
(c) able to accumulate updates far below the bf16 ulp — the property
that makes bf16 master weights trainable where round-to-nearest stalls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import (
    Trainer,
    adamw,
    apply_updates_sr,
    stochastic_round_to,
)


def test_sr_exact_on_representable():
    vals = jnp.asarray([0.0, 1.0, -1.5, 0.015625, 256.0], jnp.float32)
    for seed in range(5):
        out = stochastic_round_to(
            jnp.bfloat16, vals, jax.random.PRNGKey(seed)
        )
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(vals)
        )


def test_sr_unbiased_between_grid_points():
    # bf16 ulp at 1.0 is 2^-7: 1.0 + 2^-9 sits a quarter of the way from
    # 1.0 to 1 + 2^-7; SR must hit only those two neighbours, rounding up
    # 25% of the time, and average back to the true value
    x = jnp.full((4000,), 1.0 + 2.0 ** -9, jnp.float32)
    out = np.asarray(
        stochastic_round_to(jnp.bfloat16, x, jax.random.PRNGKey(0)),
        np.float32,
    )
    assert set(np.unique(out)) == {1.0, 1.0 + 2.0 ** -7}
    np.testing.assert_allclose(out.mean(), 1.0 + 2.0 ** -9, atol=2e-4)

    # negative side mirrors
    xn = -x
    outn = np.asarray(
        stochastic_round_to(jnp.bfloat16, xn, jax.random.PRNGKey(1)),
        np.float32,
    )
    np.testing.assert_allclose(outn.mean(), -(1.0 + 2.0 ** -9), atol=2e-4)


def test_sr_accumulates_sub_ulp_updates():
    # ulp of bf16 at 1.0 is 2^-8; a 1e-4 update is ~40x smaller. Nearest
    # rounding keeps the parameter frozen forever; SR drifts by the
    # correct expected amount.
    p = jnp.ones((512,), jnp.bfloat16)
    u = jnp.full((512,), 1e-4, jnp.float32)

    def body(i, p):
        return apply_updates_sr(p, u, jax.random.fold_in(
            jax.random.PRNGKey(7), i
        ))

    p_sr = jax.lax.fori_loop(0, 1000, body, p)
    drift = float(jnp.mean(p_sr.astype(jnp.float32))) - 1.0
    assert 0.07 < drift < 0.13, drift  # expected 0.1

    # round-to-nearest comparison: frozen at exactly 1.0
    p_rn = p
    for _ in range(50):
        p_rn = (p_rn.astype(jnp.float32) + u).astype(jnp.bfloat16)
    assert float(jnp.max(jnp.abs(p_rn.astype(jnp.float32) - 1.0))) == 0.0


def test_apply_updates_sr_mixed_tree():
    params = {
        "w_bf16": jnp.ones((8, 8), jnp.bfloat16),
        "w_f32": jnp.ones((8, 8), jnp.float32),
    }
    updates = {
        "w_bf16": jnp.full((8, 8), 0.25, jnp.float32),
        "w_f32": jnp.full((8, 8), 0.25, jnp.float32),
    }
    out = apply_updates_sr(params, updates, jax.random.PRNGKey(0))
    assert out["w_bf16"].dtype == jnp.bfloat16
    assert out["w_f32"].dtype == jnp.float32
    # 1.25 is representable in bf16: both paths must be exact
    np.testing.assert_array_equal(
        np.asarray(out["w_bf16"], np.float32), 1.25
    )
    np.testing.assert_array_equal(np.asarray(out["w_f32"]), 1.25)


def test_trainer_sr_bf16_weights_trains():
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2, weight_dtype="bfloat16",
    )
    x = np.random.default_rng(0).normal(size=(8, 1, 8, 8)).astype(np.float32)
    y = x * 2.0
    loader = [{"x": x, "y": y}]
    trainer = Trainer(model=model, n_epochs=8, stochastic_rounding=True)
    metrics = trainer.train(
        loader, {"test": loader}, adamw(5e-3),
    )
    # bf16 leaves stayed bf16 through the SR apply
    dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(trainer.params)
    }
    assert any(d == jnp.bfloat16 for d in dtypes)
    assert np.isfinite(metrics["train_err"])

    # and the SR run trains comparably to the plain run
    trainer_plain = Trainer(model=model, n_epochs=8)
    metrics_plain = trainer_plain.train(loader, {"test": loader}, adamw(5e-3))
    assert metrics["train_err"] < 2 * metrics_plain["train_err"] + 1e-3


def test_trainer_sr_keeps_f32_second_moment():
    """SR compresses the parameter copy, NOT the Adam statistics: optax
    derives state dtypes from the tree passed to init, so the Trainer
    must init the optimizer from the f32 tree before casting params to
    bf16 — a bf16 nu freezes once (1-b2)*g^2 drops below bf16's ~2^-8
    relative precision."""
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2, weight_dtype="bfloat16",
    )
    x = np.random.default_rng(0).normal(size=(4, 1, 8, 8)).astype(np.float32)
    loader = [{"x": x, "y": x}]
    trainer = Trainer(model=model, n_epochs=1, stochastic_rounding=True)
    trainer.train(loader, {"test": loader}, optax.adamw(1e-3))

    nu_dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(trainer.opt_state[0].nu)
    }
    assert nu_dtypes == {jnp.dtype(jnp.float32)}
    # while the params themselves are bf16 masters
    assert all(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(trainer.params)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )


def test_trainer_sr_epoch_scan_path():
    """SR key threading through the device_dataset one-program-per-epoch
    scan (fold_in over the scan index)."""
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2, weight_dtype="bfloat16",
    )
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 1, 8, 8)).astype(np.float32)
    y = (2.0 * x).astype(np.float32)
    loader = [
        {"x": x[i : i + 4], "y": y[i : i + 4]} for i in range(0, 16, 4)
    ]
    trainer = Trainer(model=model, n_epochs=4, stochastic_rounding=True)
    metrics = trainer.train(
        loader, {"test": loader}, adamw(3e-3), device_dataset=True,
    )
    assert np.isfinite(metrics["train_err"])
    assert any(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(trainer.params)
    )
