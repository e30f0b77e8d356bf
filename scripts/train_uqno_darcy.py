"""Train a UQNO (uncertainty-quantified NO) on Darcy flow.

Counterpart of /root/reference/scripts/train_uqno_darcy.py: first train the
base solution FNO, then freeze it and train a residual model with the
pointwise quantile loss to produce calibrated error bands.
"""

import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import LpLoss, PointwiseQuantileLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw, setup


@dataclass
class UQNOConfig(ConfigBase):
    n_train: int = 400
    base_epochs: int = 10
    residual_epochs: int = 10
    alpha: float = 0.1
    learning_rate: float = 5e-3
    verbose: bool = True


def main():
    config = make_config_from_cli(UQNOConfig)
    setup()
    train_loader, test_loaders, dp = load_darcy_flow_small(
        n_train=config.n_train, n_tests=[50], batch_size=16,
        test_batch_sizes=[16], test_resolutions=[16],
    )

    # 1. train the base solution model
    base = FNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=24
    )
    l2 = LpLoss(d=2)
    base_trainer = Trainer(
        model=base, n_epochs=config.base_epochs, data_processor=dp,
        verbose=config.verbose, eval_interval=5,
    )
    base_trainer.train(
        train_loader, test_loaders, adamw(config.learning_rate),
        training_loss=l2, eval_losses={"l2": l2},
    )
    base_params = base_trainer.params

    # 2. train the residual (quantile band) model against |error|
    residual = FNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=24
    )
    qloss = PointwiseQuantileLoss(alpha=config.alpha)

    first = next(iter(train_loader))
    res_params = jax.jit(residual.init)(
        jax.random.PRNGKey(1), jnp.asarray(first["x"][:1])
    )["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(res_params)

    @jax.jit
    def step(res_params, opt_state, batch):
        sample = dp.preprocess(dict(batch), train=True)

        def loss_fn(p):
            pred = residual.apply({"params": p}, sample["x"])
            sol = jax.lax.stop_gradient(
                base.apply({"params": base_params}, sample["x"])
            )
            err = sample["y"] - sol
            return qloss(pred, err)

        loss, grads = jax.value_and_grad(loss_fn)(res_params)
        updates, opt_state = opt.update(grads, opt_state, res_params)
        return optax.apply_updates(res_params, updates), opt_state, loss

    for epoch in range(config.residual_epochs):
        losses = []
        for batch in train_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            res_params, opt_state, loss = step(res_params, opt_state, batch)
            losses.append(float(loss))
        if config.verbose:
            print(f"[uq {epoch}] quantile loss {np.mean(losses):.5f}")

    # 3. calibration check: fraction of points inside the predicted band
    inside, total = 0, 0
    for batch in test_loaders[16]:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        sample = dp.preprocess(dict(batch), train=False)
        sol = jax.jit(lambda p, xx: base.apply({"params": p}, xx))(
            base_params, sample["x"]
        )
        band = jax.jit(lambda p, xx: residual.apply({"params": p}, xx))(
            res_params, sample["x"]
        )
        sol, _ = dp.postprocess(sol, sample, train=False)
        err = np.abs(np.asarray(batch["y"]) - np.asarray(sol))
        inside += (err <= np.abs(np.asarray(band))).sum()
        total += err.size
    print(f"coverage: {inside / total:.3f} (target {1 - config.alpha})")
    return base_params, res_params


if __name__ == "__main__":
    main()
