"""Rollout evaluation (+ optional pushforward fine-tune) on NS trajectories.

Evaluates a trained single-step NS model autoregressively on held-out raw
trajectories (per-step relative L2 at t = 1..T), and optionally fine-tunes
it with multi-step pushforward training (Trainer ``rollout_steps``) on
trajectory windows before re-evaluating — the experiment the reference's
rollout-eval machinery (reference ``trainer.py:589-671``) sets up but
never closes the loop on (it has no rollout *training*).

Usage:
  python scripts/eval_ns_rollout.py --save_dir runs/ns128_flagship \
      --res 128 --horizon 10 [--pushforward_epochs 3 --rollout_steps 4]
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_navier_stokes_pt
from neuraloperator_tpu.data.datasets.ns_solver import (
    trajectories_to_windows,
)
from neuraloperator_tpu.data.datasets.tensor_dataset import (
    DataLoader, TensorDataset,
)
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw, setup
from neuraloperator_tpu.training.training_state import load_training_state


@dataclass
class RolloutConfig(ConfigBase):
    save_dir: str = "runs/ns128_flagship"
    save_name: str = "best_model"
    res: int = 128
    horizon: int = 10
    n_traj: int = 40
    batch: int = 8
    n_modes: int = 64
    hidden_channels: int = 64
    projection_channel_ratio: int = 4
    # pushforward fine-tune (0 epochs = eval only)
    pushforward_epochs: int = 0
    rollout_steps: int = 4
    learning_rate: float = 1e-4
    train_traj: int = 64
    verbose: bool = True


def per_step_rollout_l2(model, params, dp, x0, y_traj, batch):
    """Relative L2 per rollout step, averaged over trajectories."""

    @jax.jit
    def rollout(params, x, y):
        l2 = LpLoss(d=2, reduction="mean")

        def body(x, yt):
            sample = dp.preprocess({"x": x}, train=False)
            out = model.apply({"params": params}, sample["x"])
            out, _ = dp.postprocess(out, sample, train=False)
            return out, l2(out, yt)

        _, vals = jax.lax.scan(body, x, jnp.moveaxis(y, 0, 1))
        return vals  # (T,)

    totals = np.zeros(y_traj.shape[1])
    n = 0
    for i in range(0, len(x0), batch):
        xb = jnp.asarray(x0[i : i + batch])
        yb = jnp.asarray(y_traj[i : i + batch])
        totals += np.asarray(rollout(params, xb, yb)) * len(xb)
        n += len(xb)
    return totals / n


def main():
    config = make_config_from_cli(RolloutConfig)
    setup()

    res = config.res
    # prefer the checkpoint's persisted normalizer sidecar (exact
    # training stats); fall back to a refit for pre-sidecar checkpoints
    from neuraloperator_tpu.data.transforms import load_data_processor

    dp = load_data_processor(config.save_dir)
    if dp is not None:
        print(f"using saved normalizers from {config.save_dir}")
    else:
        _, _, dp = load_navier_stokes_pt(
            n_train=256, n_tests=[8], batch_size=8, test_batch_sizes=[8],
            train_resolution=res, test_resolutions=[res],
        )

    model = FNO(
        n_modes=(config.n_modes, config.n_modes),
        in_channels=1, out_channels=1,
        hidden_channels=config.hidden_channels,
        projection_channel_ratio=config.projection_channel_ratio,
    )
    x_init = jnp.zeros((1, 1, res, res), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x_init)["params"]
    params, _, epoch = load_training_state(
        config.save_dir, config.save_name, template
    )
    print(f"loaded {config.save_name} (epoch {epoch})")

    data_dir = (
        Path(__file__).resolve().parents[1]
        / "neuraloperator_tpu/data/datasets/data/ns_raw"
    )
    traj = np.load(data_dir / f"nsforcing_traj_test_{res}.npy", mmap_mode="r")
    traj = np.asarray(traj[: config.n_traj], np.float32)
    T = config.horizon
    # start rollouts mid-trajectory (on-attractor states, the canonical
    # task) from snapshot index 10
    t0 = 10
    x0 = traj[:, t0][:, None]  # (n, 1, res, res)
    y = traj[:, t0 + 1 : t0 + 1 + T][:, :, None]  # (n, T, 1, res, res)

    steps = per_step_rollout_l2(model, params, dp, x0, y, config.batch)
    print("single-step-trained rollout rel-l2 per step:")
    for t, v in enumerate(steps, 1):
        print(f"  t={t}: {v:.5f}")

    if config.pushforward_epochs > 0:
        train_traj = np.asarray(
            np.load(
                data_dir / f"nsforcing_traj_train_{res}.npy", mmap_mode="r"
            )[: config.train_traj],
            np.float32,
        )
        xw, yw = trajectories_to_windows(train_traj, config.rollout_steps)
        if config.verbose:
            print(f"pushforward fine-tune on {len(xw)} windows "
                  f"(K={config.rollout_steps})")
        loader = DataLoader(
            TensorDataset(x=xw, y=yw), config.batch, shuffle=True,
            drop_last=True,
        )
        trainer = Trainer(
            model=model, n_epochs=config.pushforward_epochs,
            data_processor=dp, verbose=config.verbose, eval_interval=10_000,
        )
        trainer.params = params
        trainer.train(
            loader, {}, adamw(config.learning_rate),
            training_loss=H1Loss(d=2),
            rollout_steps=config.rollout_steps, pushforward=True,
        )
        steps_pf = per_step_rollout_l2(
            model, trainer.params, dp, x0, y, config.batch
        )
        print("pushforward-tuned rollout rel-l2 per step:")
        for t, v in enumerate(steps_pf, 1):
            print(f"  t={t}: {v:.5f}")
    return steps


if __name__ == "__main__":
    main()
