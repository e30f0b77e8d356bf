"""Training-efficiency toolkit: EMA, SR, ZeRO-1, 8-bit state, int8 serving.

Five ahead-of-reference training/serving levers this package ships on top
of the reference's feature set (reference trains plain f32 AdamW,
``/root/reference/neuralop/training/adamw.py``), each demonstrated
end-to-end on a small FNO:

1. ``with_ema`` — Polyak-averaged parameters carried in the optimizer
   state (checkpoints/donation/ZeRO apply to it automatically).
2. ``Trainer(stochastic_rounding=True)`` — unbiased bf16 master params:
   sub-ulp updates accumulate correctly in expectation.
3. ``Trainer(zero_sharding=True)`` — optimizer state sharded 1/N over the
   data-parallel mesh axis (multi-device; shown on a CPU mesh in CI).
4. ``adamw(factored_second_moment=True, mu_dtype="int8")`` — 8-bit
   optimizer state: factored nu + blockwise-int8 first moment.
5. ``CompiledForward(quantize='int8')`` — weight-only int8 serving.

Runs on CPU; every lever is exercised the same way on TPU.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.serving import CompiledForward
from neuraloperator_tpu.training import (
    Trainer,
    adamw,
    ema_params,
    with_ema,
)

rng = np.random.default_rng(0)
x = rng.normal(size=(16, 1, 16, 16)).astype(np.float32)
y = (2.0 * x).astype(np.float32)
loader = [{"x": x[i : i + 8], "y": y[i : i + 8]} for i in (0, 8)]

# --- 1. EMA/Polyak averaging ------------------------------------------
model = FNO(n_modes=(8, 8), in_channels=1, out_channels=1,
            hidden_channels=16, n_layers=2)
trainer = Trainer(model=model, n_epochs=10)
metrics = trainer.train(
    loader, {"test": loader}, with_ema(adamw(3e-3), decay=0.9),
)
ema = ema_params(trainer.opt_state)
out_live = model.apply({"params": trainer.params}, jnp.asarray(x))
out_ema = model.apply({"params": ema}, jnp.asarray(x))
print(f"train_err={metrics['train_err']:.4f}  "
      f"live-vs-ema output delta="
      f"{float(jnp.max(jnp.abs(out_live - out_ema))):.2e}")

# --- 2. stochastic-rounding bf16 master params ------------------------
model_bf16 = FNO(n_modes=(8, 8), in_channels=1, out_channels=1,
                 hidden_channels=16, n_layers=2,
                 weight_dtype="bfloat16")
sr_trainer = Trainer(model=model_bf16, n_epochs=10,
                     stochastic_rounding=True)
sr_metrics = sr_trainer.train(loader, {"test": loader}, adamw(3e-3))
n_bf16 = sum(
    leaf.size
    for leaf in jax.tree_util.tree_leaves(sr_trainer.params)
    if leaf.dtype == jnp.bfloat16
)
print(f"SR train_err={sr_metrics['train_err']:.4f}  "
      f"bf16 param elements={n_bf16}")

# --- 3. ZeRO-1 on a device mesh (needs >1 device; CPU-mesh in CI) -----
if jax.device_count() > 1:
    from neuraloperator_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.init(model_parallel_size=1)
    z_trainer = Trainer(model=model, n_epochs=2, mesh=mesh,
                        zero_sharding=True)
    z_metrics = z_trainer.train(loader, {"test": loader}, adamw(3e-3))
    print(f"ZeRO-1 on {mesh.shape}: train_err={z_metrics['train_err']:.4f}")
else:
    print("ZeRO-1: skipped (single device; see tests/test_zero.py)")

# --- 4. 8-bit optimizer state (factored nu + blockwise-int8 mu) -------
q_trainer = Trainer(model=model, n_epochs=10)
q_metrics = q_trainer.train(
    loader, {"test": loader},
    adamw(3e-3, factored_second_moment=True, mu_dtype="int8"),
)
from neuraloperator_tpu.training import Quantized8  # noqa: E402

n_int8 = sum(
    leaf.codes.size
    for leaf in jax.tree_util.tree_leaves(
        q_trainer.opt_state,
        is_leaf=lambda x: isinstance(x, Quantized8),
    )
    if isinstance(leaf, Quantized8)
)
print(f"int8-mu train_err={q_metrics['train_err']:.4f}  "
      f"int8 state elements={n_int8}")

# --- 5. int8 weight-only serving --------------------------------------
srv = CompiledForward(model, trainer.params, jnp.asarray(x[:8]),
                      batch_sizes=(8,), quantize="int8")
ref = model.apply({"params": trainer.params}, jnp.asarray(x[:8]))
q = srv(jnp.asarray(x[:8]))
rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
print(f"int8 serving relative output error: {rel:.3%}")
