"""Tensor-GaLore optimizer tests (mirrors reference training/tests/test_optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.training import tensor_galore_adamw


def test_galore_reduces_loss():
    rng = np.random.RandomState(0)
    W_true = jnp.asarray(rng.randn(32, 32, 16), jnp.float32)
    params = {"w": jnp.zeros((32, 32, 16)), "b": jnp.zeros((4,))}
    x = jnp.asarray(rng.randn(64, 32), jnp.float32)

    def loss_fn(p):
        pred = jnp.einsum("ni,iok->nok", x, p["w"])
        target = jnp.einsum("ni,iok->nok", x, W_true)
        return jnp.mean((pred - target) ** 2) + jnp.sum(p["b"] ** 2)

    opt = tensor_galore_adamw(5e-2, rank=0.5, update_proj_gap=5, galore_scale=1.0)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s, p)
        import optax

        return optax.apply_updates(p, upd), s, loss

    l0 = None
    for i in range(150):
        params, state, loss = step(params, state)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < 0.5 * l0


def test_galore_state_is_low_rank():
    opt = tensor_galore_adamw(1e-3, rank=0.25, min_dim_size_to_project=8)
    params = {"w": jnp.zeros((16, 16, 16))}
    state = opt.init(params)
    leaf = state.leaves["w"]
    assert leaf.m.shape == (4, 4, 4)  # 0.25 * 16 per mode
    assert leaf.factors[0].shape == (16, 4)


def test_factored_adamw_converges_and_shrinks_state():
    """Factored-nu AdamW reaches comparable loss to full AdamW on a small
    least-squares problem with a fraction of the optimizer-state memory."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from neuraloperator_tpu.training.optimizer import adamw

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(32, 32), jnp.float32)
    W_true = jnp.asarray(rng.randn(32, 32), jnp.float32)
    X = jnp.asarray(rng.randn(64, 32), jnp.float32)
    Y = X @ W_true.T

    def loss_fn(params):
        return jnp.mean((X @ (params["w"] @ A).T - Y) ** 2)

    def train(opt, steps=300):
        params = {"w": jnp.zeros((32, 32), jnp.float32)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(g, state, params)
            return optax.apply_updates(params, upd), state, loss

        for _ in range(steps):
            params, state, loss = step(params, state)
        return float(loss), state

    full_loss, _ = train(adamw(1e-2), steps=1000)
    fact_loss, fact_state = train(
        adamw(1e-2, factored_second_moment=True, mu_dtype=jnp.bfloat16),
        steps=1000,
    )
    init_loss = float(loss_fn({"w": jnp.zeros((32, 32), jnp.float32)}))
    assert fact_loss < 0.05 * init_loss  # converges
    assert fact_loss < 2.0 * full_loss  # tracks full Adam

    # state memory: factored nu stores row+col means, not the full matrix
    inner = fact_state[0]  # FactoredAdamState inside the chain
    assert inner.nu_row["w"].shape == (32,)
    assert inner.nu_col["w"].shape == (32,)
    assert inner.nu_full["w"].shape == ()
    assert inner.mu["w"].dtype == jnp.bfloat16
