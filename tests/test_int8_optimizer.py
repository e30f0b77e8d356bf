"""Blockwise int8 first-moment Adam (8-bit optimizer state).

No reference counterpart (reference AdamW keeps full f32 exp_avg /
exp_avg_sq, ``/root/reference/neuralop/training/adamw.py:62-110``);
this is a TPU HBM-traffic lever in the style of Dettmers et al. 2021
layered on the factored-nu kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuraloperator_tpu.training.optimizer import (
    Quantized8,
    adamw,
    dequantize_blockwise,
    quantize_blockwise,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(7, 123) * 3.0, jnp.float32)  # non-block-multiple
    q = quantize_blockwise(x, block=256)
    assert q.codes.dtype == jnp.int8
    back = dequantize_blockwise(q, x.shape)
    assert back.shape == x.shape
    # linear absmax quantization: per-block abs error <= absmax/127 * 0.5
    err = np.abs(np.asarray(back - x))
    bound = float(jnp.max(jnp.abs(x))) / 127.0 * 0.51
    assert err.max() <= bound


def test_quantize_zero_and_exact_block():
    z = jnp.zeros((2048,), jnp.float32)
    q = quantize_blockwise(z)
    assert np.asarray(dequantize_blockwise(q, z.shape)).max() == 0.0
    x = jnp.linspace(-1.0, 1.0, 4096, dtype=jnp.float32)
    back = dequantize_blockwise(quantize_blockwise(x), x.shape)
    assert float(jnp.max(jnp.abs(back - x))) < 1.0 / 127.0


def test_int8_requires_factored():
    with pytest.raises(ValueError):
        adamw(1e-3, mu_dtype="int8")


def test_int8_mu_adam_converges_and_stores_codes():
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(32, 32), jnp.float32)
    W_true = jnp.asarray(rng.randn(32, 32), jnp.float32)
    X = jnp.asarray(rng.randn(64, 32), jnp.float32)
    Y = X @ W_true.T

    def loss_fn(params):
        return jnp.mean(
            (X @ (params["w"] @ A).T + params["b"] - Y) ** 2
        )

    def train(opt, steps):
        params = {"w": jnp.zeros((32, 32), jnp.float32),
                  "b": jnp.zeros((32,), jnp.float32)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(g, state, params)
            return optax.apply_updates(params, upd), state, loss

        for _ in range(steps):
            params, state, loss = step(params, state)
        return float(loss), state

    full_loss, _ = train(adamw(1e-2), 1000)
    q_loss, q_state = train(
        adamw(1e-2, factored_second_moment=True, mu_dtype="int8"), 1000
    )
    init_loss = float(loss_fn({"w": jnp.zeros((32, 32), jnp.float32),
                               "b": jnp.zeros((32,), jnp.float32)}))
    assert q_loss < 0.05 * init_loss
    assert q_loss < 2.0 * full_loss

    inner = q_state[0]
    mu_leaf = inner.mu["w"]
    assert isinstance(mu_leaf, Quantized8)
    assert mu_leaf.codes.dtype == jnp.int8
    assert mu_leaf.scale.dtype == jnp.float32
    # small (1-dim) leaves stay bf16, not padded into int8 blocks
    assert inner.mu["b"].dtype == jnp.bfloat16


def test_int8_mu_matches_bf16_mu_short_trajectory():
    """Over a few steps the int8-mu trajectory stays close to the bf16-mu
    one (quantization noise ~1/127 of blockwise mu magnitude)."""
    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.randn(16, 8), jnp.float32)
    Y = jnp.asarray(rng.randn(16, 4), jnp.float32)

    def loss_fn(params):
        return jnp.mean((X @ params["w"] - Y) ** 2)

    def run(mu_dtype, steps=25):
        opt = adamw(1e-2, factored_second_moment=True, mu_dtype=mu_dtype)
        params = {"w": jnp.zeros((8, 4), jnp.float32)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            _, g = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(g, state, params)
            return optax.apply_updates(params, upd), state

        for _ in range(steps):
            params, state = step(params, state)
        return params["w"]

    w8 = run("int8")
    w16 = run(jnp.bfloat16)
    rel = float(jnp.linalg.norm(w8 - w16) / jnp.linalg.norm(w16))
    assert rel < 0.05


def test_build_optimizer_policies():
    from neuraloperator_tpu.config import OptConfig
    from neuraloperator_tpu.training.optimizer import (
        EmaState,
        build_optimizer,
    )

    params = {"w": jnp.zeros((8, 4), jnp.float32)}

    cfg = OptConfig(learning_rate=1e-3, opt_state="factored8")
    opt = build_optimizer(cfg, steps_per_epoch=2)
    state = opt.init(params)
    assert isinstance(state[0].mu["w"], Quantized8)

    cfg_ema = OptConfig(learning_rate=1e-3, ema_decay=0.99)
    opt_ema = build_optimizer(cfg_ema)
    assert isinstance(opt_ema.init(params), EmaState)

    cfg_bad = OptConfig(opt_state="nope")
    with pytest.raises(ValueError):
        build_optimizer(cfg_bad)
