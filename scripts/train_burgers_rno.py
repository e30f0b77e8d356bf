"""Train an RNO on Burgers time series.

Counterpart of /root/reference/scripts/train_burgers_rno.py: the model sees
a window of past states (b, t, c, x) and predicts the next state.
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
from neuraloperator_tpu.data.datasets.synthetic import solve_burgers_trajectory
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import RNO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class RNOConfig(ConfigBase):
    n_train: int = 32
    n_test: int = 8
    res: int = 32
    window: int = 4
    n_epochs: int = 20
    batch_size: int = 8
    learning_rate: float = 1e-3
    verbose: bool = True


def main():
    config = make_config_from_cli(RNOConfig)
    setup()
    rng = np.random.default_rng(0)
    grid = np.linspace(0, 2 * np.pi, config.res, endpoint=False)

    def make(n):
        xs, ys = [], []
        for _ in range(n):
            coef = rng.standard_normal(4) / np.arange(1, 5)
            u0 = sum(c * np.sin((k + 1) * grid) for k, c in enumerate(coef))
            # steps_per_frame=100 keeps the explicit RK4 viscous term
            # stable at res 32 (default 20 overflows)
            traj = solve_burgers_trajectory(
                u0, visc=0.05, nt=config.window + 1, steps_per_frame=100
            )  # (w+1, res)
            xs.append(traj[: config.window][:, None])  # (w, 1, res)
            ys.append(traj[config.window][None])  # (1, res)
        return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)

    x_train, y_train = make(config.n_train)
    x_test, y_test = make(config.n_test)

    model = RNO(
        n_modes=(8,), in_channels=1, out_channels=1, hidden_channels=24,
        n_layers=2,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x_train[:1])
    )["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)
    l2 = LpLoss(d=1)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return l2(model.apply({"params": p}, x), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = config.batch_size
    for epoch in range(config.n_epochs):
        perm = np.random.permutation(len(x_train))
        losses = []
        for i in range(0, len(x_train), bs):
            idx = perm[i : i + bs]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x_train[idx]),
                jnp.asarray(y_train[idx]),
            )
            losses.append(float(loss))
        if config.verbose:
            print(f"[{epoch}] train l2 {np.mean(losses):.5f}")

    out = jax.jit(lambda p, xx: model.apply({"params": p}, xx))(
        params, jnp.asarray(x_test)
    )
    print("test l2:", float(l2(out, jnp.asarray(y_test))) / len(x_test))
    return params


if __name__ == "__main__":
    main()
