"""Multi-step (pushforward) rollout training on Navier-Stokes trajectories.

Trains a single-step FNO on forced-NS snapshots, measures how its error
accumulates under autoregressive rollout, then fine-tunes with
``Trainer(..., rollout_steps=K, pushforward=True)`` — the model is
unrolled K steps against trajectory targets with a stop-gradient between
steps (single-step backward cost, rollout-state input distribution) — and
shows the drift shrink. The closed training loop behind the reference's
rollout-evaluation machinery (reference ``trainer.py:589-671``).

Small enough to run on CPU in a couple of minutes.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.data.datasets.ns_solver import (
    generate_nsforcing_trajectories,
    trajectories_to_pairs,
    trajectories_to_windows,
)
from neuraloperator_tpu.data.datasets.tensor_dataset import (
    DataLoader,
    TensorDataset,
)
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw

RES, HORIZON = 32, 4

# %% Generate a small trajectory dataset with the in-package batched
# pseudo-spectral solver (visc 1e-3, Kolmogorov forcing, GRF ICs).
traj = next(
    generate_nsforcing_trajectories(
        n_trajectories=10, res=RES, T=8.0, dt=2e-3, record_dt=1.0, seed=3
    )
)  # (10, 9, 32, 32)
train_traj, test_traj = traj[:8], traj[8:]

# %% Single-step training on consecutive-snapshot pairs.
x, y = trajectories_to_pairs(train_traj)
loader = DataLoader(
    TensorDataset(x=x[:, None], y=y[:, None]), batch_size=16, shuffle=True
)
model = FNO(n_modes=(12, 12), in_channels=1, out_channels=1,
            hidden_channels=32)
trainer = Trainer(model=model, n_epochs=30, eval_interval=10_000)
trainer.train(loader, {}, adamw(2e-3), training_loss=LpLoss(d=2))


def rollout_l2(params):
    """Autoregressive per-step relative L2 on the held-out trajectory."""
    l2 = LpLoss(d=2, reduction="mean")

    @jax.jit
    def run(params, x0, ys):
        def body(cur, yt):
            out = model.apply({"params": params}, cur)
            return out, l2(out, yt)

        _, vals = jax.lax.scan(body, x0, ys)
        return vals

    x0 = jnp.asarray(test_traj[:, 0][:, None])
    ys = jnp.moveaxis(jnp.asarray(test_traj[:, 1 : 1 + HORIZON][:, :, None]),
                      0, 1)
    return np.asarray(run(params, x0, ys))


base = rollout_l2(trainer.params)
print("single-step-trained rollout rel-l2:",
      [round(float(v), 4) for v in base])

# %% Pushforward fine-tune: unroll 3 steps per training window, gradient
# flows through the last step only (stop_gradient between steps keeps the
# backward cost of single-step training while exposing the model to its
# own rollout states).
xw, yw = trajectories_to_windows(train_traj, horizon=3)
w_loader = DataLoader(
    TensorDataset(x=xw, y=yw), batch_size=16, shuffle=True, drop_last=True
)
ft = Trainer(model=model, n_epochs=10, eval_interval=10_000)
ft.params = trainer.params
ft.train(w_loader, {}, adamw(2e-4), training_loss=LpLoss(d=2),
         rollout_steps=3, pushforward=True)

tuned = rollout_l2(ft.params)
print("pushforward-tuned rollout rel-l2:  ",
      [round(float(v), 4) for v in tuned])
print(f"drift at t={HORIZON}: {base[-1]:.4f} -> {tuned[-1]:.4f}")
