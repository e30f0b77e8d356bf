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
