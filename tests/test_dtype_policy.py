"""Mixed-precision dtype-policy regression guards.

Round-2 found (+35% step time when fixed) that a single f32-accumulated
op output silently promotes every downstream bf16 matmul into 3-pass
mode. These tests pin the policy invariants the roofline analysis and
`scripts/audit_dtype_converts.py` rely on:

- under ``weight_dtype='bfloat16'`` + ``fno_block_precision='mixed'``
  with bf16 params and input, EVERY module boundary in the FNO forward
  is bf16 (no silent f32 promotion anywhere);
- the optimized train-step HLO contains no standalone (unfused) convert
  instruction — boundary converts must fuse into their consumers.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from neuraloperator_tpu.models import FNO


def _mixed_model():
    return FNO(
        n_modes=(8, 8), in_channels=1, out_channels=1,
        hidden_channels=16, n_layers=2, projection_channel_ratio=4,
        weight_dtype="bfloat16", fno_block_precision="mixed",
    )


def _half_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree,
    )


def test_all_module_boundaries_bf16():
    model = _mixed_model()
    x = jnp.zeros((2, 1, 16, 16), jnp.float32)
    params = _half_tree(model.init(jax.random.PRNGKey(0), x)["params"])

    _, inter = model.apply(
        {"params": params}, x.astype(jnp.bfloat16),
        capture_intermediates=True, mutable=["intermediates"],
    )

    bad = []

    def walk(t, prefix=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, prefix + "/" + k)
        elif isinstance(t, tuple):
            for v in t:
                walk(v, prefix)
        elif t.dtype != jnp.bfloat16:
            bad.append((prefix, str(t.dtype)))

    walk(inter["intermediates"])
    assert not bad, f"silent f32 promotion at module boundaries: {bad}"


def test_train_step_has_no_standalone_converts():
    import re

    from neuraloperator_tpu.losses import H1Loss
    from neuraloperator_tpu.training.optimizer import adamw

    model = _mixed_model()
    x = jnp.zeros((2, 1, 16, 16), jnp.float32)
    y = jnp.ones((2, 1, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    opt = adamw(1e-3, factored_second_moment=True, mu_dtype=jnp.bfloat16)
    opt_state = opt.init(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params))
    h1 = H1Loss(d=2)
    ynorm = h1.ynorm_sq(y)

    def step(params, opt_state, xx, yy, yn):
        def loss_fn(p):
            p = _half_tree(p)
            out = model.apply({"params": p}, xx.astype(jnp.bfloat16))
            return h1(out.astype(jnp.float32), yy, ynorm_sq=yn)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    hlo = (
        jax.jit(step)
        .lower(params, opt_state, x, y, ynorm)
        .compile()
        .as_text()
    )
    entry = hlo[hlo.index("ENTRY "):]
    entry = entry[: entry.index("\n}") + 2]
    converts = re.findall(
        r"^\s*(?:ROOT\s+)?%?\S+ = (\w+)\[([\d,]*)\][^ ]* convert\(",
        entry, re.M,
    )
    # scalar/small converts (loss printout etc.) are harmless; any
    # array-shaped standalone convert is a failed fusion of a boundary
    import math

    big = [c for c in converts
           if c[1]
           and math.prod(int(d) for d in c[1].split(",") if d) > 4096]
    assert not big, f"unfused boundary converts: {big}"


def _tiny_tree(dtype):
    return {
        "w": jnp.ones((8, 8), dtype),
        "b": jnp.zeros((8,), dtype),
    }


def test_final_update_cast_matches_param_dtype():
    """bf16 params get bf16 updates from the wrapped chain (the cast is
    inside the optimizer, not left to apply_updates)."""
    from neuraloperator_tpu.training.optimizer import adamw

    params = _tiny_tree(jnp.bfloat16)
    grads = _tiny_tree(jnp.bfloat16)
    opt = adamw(1e-3, weight_decay=1e-4, factored_second_moment=True,
                mu_dtype=jnp.bfloat16)
    state = opt.init(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params))
    updates, _ = opt.update(grads, state, params)
    assert all(u.dtype == jnp.bfloat16
               for u in jax.tree_util.tree_leaves(updates))


def test_final_update_cast_preserves_state_structure_and_f32_trajectory():
    """The wrapper must not change the optimizer-state pytree (existing
    optimizer.msgpack checkpoints restore unchanged) and must be an exact
    no-op for f32 params."""
    from neuraloperator_tpu.training.optimizer import adamw

    params = _tiny_tree(jnp.float32)
    grads = jax.tree_util.tree_map(lambda a: a + 0.1, _tiny_tree(jnp.float32))
    for factored in (True, False):
        opt_on = adamw(1e-3, factored_second_moment=factored,
                       cast_final_updates=True)
        opt_off = adamw(1e-3, factored_second_moment=factored,
                        cast_final_updates=False)
        s_on, s_off = opt_on.init(params), opt_off.init(params)
        assert (jax.tree_util.tree_structure(s_on)
                == jax.tree_util.tree_structure(s_off))
        u_on, _ = opt_on.update(grads, s_on, params)
        u_off, _ = opt_off.update(grads, s_off, params)
        for a, b in zip(jax.tree_util.tree_leaves(u_on),
                        jax.tree_util.tree_leaves(u_off)):
            assert a.dtype == b.dtype == jnp.float32
            assert jnp.array_equal(a, b)


def test_build_optimizer_sr_keeps_full_precision_updates():
    """stochastic_rounding=True must disable the final cast: SR's
    stochastic round wants the f32 update at the rounding point."""
    from dataclasses import dataclass

    from neuraloperator_tpu.training.optimizer import build_optimizer

    @dataclass
    class Opt:
        learning_rate: float = 1e-3
        weight_decay: float = 1e-4
        step_size: int = 10
        opt_state: str = "factored"
        stochastic_rounding: bool = True

    params = _tiny_tree(jnp.bfloat16)
    grads = _tiny_tree(jnp.bfloat16)
    opt = build_optimizer(Opt())
    state = opt.init(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params))
    updates, _ = opt.update(grads, state, params)
    assert all(u.dtype == jnp.float32
               for u in jax.tree_util.tree_leaves(updates))

    opt2 = build_optimizer(Opt(stochastic_rounding=False))
    updates2, _ = opt2.update(grads, opt2.init(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params)), params)
    assert all(u.dtype == jnp.bfloat16
               for u in jax.tree_util.tree_leaves(updates2))
