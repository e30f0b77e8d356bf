"""Train GINO on the nonlinear Poisson point-cloud problem with a
physics-informed equation loss.

Counterpart of /root/reference/scripts/train_poisson.py: supervised data
loss on all query points plus the Poisson interior residual computed by
differentiating the model w.r.t. query coordinates (autograd route).

Usage (flat flags — this script uses a custom loop, not Trainer):
    python scripts/train_poisson.py --n_epochs 10 --learning_rate 1e-3
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
from neuraloperator_tpu.data.datasets import NonlinearPoissonDataset
from neuraloperator_tpu.losses import LpLoss, PoissonInteriorLoss
from neuraloperator_tpu.models import FNOGNO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class PoissonConfig(ConfigBase):
    n_train: int = 4
    n_test: int = 2
    n_epochs: int = 10
    learning_rate: float = 1e-3
    interior_weight: float = 0.0  # set > 0 to enable the physics loss
    n_physics_points: int = 32
    verbose: bool = True


def main():
    config = make_config_from_cli(PoissonConfig)
    setup()
    ds = NonlinearPoissonDataset(
        n_train=config.n_train, n_test=config.n_test
    )

    grid_n = 16
    axes = [np.linspace(0, 1, grid_n)] * 2
    in_p = jnp.asarray(
        np.stack(np.meshgrid(*axes, indexing="ij"), -1), jnp.float32
    )

    model = FNOGNO(
        in_channels=1,
        out_channels=1,
        gno_coord_dim=2,
        gno_radius=0.2,
        fno_n_modes=(8, 8),
        fno_hidden_channels=24,
        fno_n_layers=3,
        gno_max_neighbors=16,
        gno_batched=False,
    )
    interior_loss = PoissonInteriorLoss()
    l2 = LpLoss(d=1)

    def prep(sample):
        # gridded source field as FNO input: nearest-sample f on the grid
        pts = sample["input_geom"]
        f_vals = sample["x"][:, 0]
        f_grid = np.zeros((grid_n, grid_n, 1), np.float32)
        cnt = np.zeros((grid_n, grid_n, 1), np.float32)
        ij = np.clip((pts * (grid_n - 1)).astype(int), 0, grid_n - 1)
        for (i, j), v in zip(ij, f_vals):
            f_grid[i, j, 0] += v
            cnt[i, j, 0] += 1
        f_grid = f_grid / np.maximum(cnt, 1)
        return (
            jnp.asarray(f_grid),
            jnp.asarray(sample["output_queries"]),
            jnp.asarray(sample["y"]),
            jnp.asarray(sample["output_source_terms_domain"]),
            int(sample["num_boundary"]),
        )

    batches = [prep(ds.train_data[i]) for i in range(len(ds.train_data))]
    f0, q0, y0, _, _ = batches[0]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), in_p, q0, f0)["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, f_grid, queries, y, src, n_phys_queries):
        def loss_fn(p):
            out = model.apply({"params": p}, in_p, queries, f_grid)
            data = l2(out.T[None], y.T[None])
            if config.interior_weight > 0:
                def u_fn(q):
                    return model.apply({"params": p}, in_p, q, f_grid)[:, 0]

                phys = interior_loss(
                    u_fn,
                    output_queries=n_phys_queries,
                    output_source_terms_domain=src[: config.n_physics_points],
                )
                return data + config.interior_weight * phys
            return data

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(config.n_epochs):
        losses = []
        for f_grid, queries, y, src, nb in batches:
            phys_q = queries[nb : nb + config.n_physics_points]
            params, opt_state, loss = step(
                params, opt_state, f_grid, queries, y, src, phys_q
            )
            losses.append(float(loss))
        if config.verbose:
            print(f"[{epoch}] loss {np.mean(losses):.5f}")

    for i in range(len(ds.test_data)):
        f_grid, queries, y, _, _ = prep(ds.test_data[i])
        out = jax.jit(
            lambda p, a, b, c: model.apply({"params": p}, a, b, c)
        )(params, in_p, queries, f_grid)
        print("test l2:", float(l2(out.T[None], y.T[None])))
    return params


if __name__ == "__main__":
    main()
