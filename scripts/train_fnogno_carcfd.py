"""Train FNOGNO on car-CFD surface pressure (mini car dataset).

Counterpart of /root/reference/scripts/train_fnogno_carcfd.py: the SDF on a
regular query grid is the gridded input; an output GNO maps the latent FNO
features to pressure at the surface vertices.

Usage (flat flags — this script uses a custom loop, not Trainer):
    python scripts/train_fnogno_carcfd.py --n_epochs 20 --latent_n 16
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
from neuraloperator_tpu.data.datasets import load_mini_car
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNOGNO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class CarConfig(ConfigBase):
    n_epochs: int = 20
    learning_rate: float = 1e-3
    radius: float = 0.25
    max_neighbors: int = 32
    verbose: bool = True
    # 'mini' = shipped 3-sample mini_car.pt; 'synthetic' = in-package
    # deformed-ellipsoid potential-flow dataset at n_train/n_test scale
    data_source: str = "mini"
    n_train: int = 100
    n_test: int = 20
    eval_interval: int = 10


def main():
    config = make_config_from_cli(CarConfig)
    setup()
    if config.data_source == "synthetic":
        from neuraloperator_tpu.data.datasets import load_synthetic_cfd

        samples = load_synthetic_cfd(config.n_train + config.n_test)
        train, test = samples[: config.n_train], samples[config.n_train :]
    else:
        samples = load_mini_car()
        train, test = samples[:2], samples[2:]

    model = FNOGNO(
        in_channels=1,
        out_channels=1,
        gno_coord_dim=3,
        gno_radius=config.radius,
        fno_n_modes=(8, 8, 8),
        fno_hidden_channels=32,
        fno_n_layers=4,
        gno_max_neighbors=config.max_neighbors,
        gno_batched=False,
    )

    def prep(sample):
        qp = sample["query_points"].astype(np.float32)  # (n,n,n,3)
        lo = qp.reshape(-1, 3).min(0)
        hi = qp.reshape(-1, 3).max(0)
        qp = (qp - lo) / (hi - lo + 1e-9)
        sdf = sample["distance"].astype(np.float32)  # (n,n,n,1)
        verts = sample["vertices"].astype(np.float32)
        verts = (verts - lo) / (hi - lo + 1e-9)
        press = sample["press"].astype(np.float32).T  # (n_verts, 1)
        return (
            jnp.asarray(qp),
            jnp.asarray(verts),
            jnp.asarray(sdf),
            jnp.asarray(press),
        )

    batches = [prep(s) for s in train]
    in_p, out_p, f, y = batches[0]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), in_p, out_p, f)["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)
    l2 = LpLoss(d=1)

    @jax.jit
    def step(params, opt_state, in_p, out_p, f, y):
        def loss_fn(p):
            out = model.apply({"params": p}, in_p, out_p, f)
            return l2(out.T[None], y.T[None])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fwd = jax.jit(lambda p, a, b, c: model.apply({"params": p}, a, b, c))
    test_batches = [prep(s) for s in test]

    def eval_test():
        return float(np.mean([
            float(l2(fwd(params, a, b, c).T[None], y.T[None]))
            for a, b, c, y in test_batches
        ]))

    for epoch in range(config.n_epochs):
        losses = []
        for in_p, out_p, f, y in batches:
            params, opt_state, loss = step(params, opt_state, in_p, out_p, f, y)
            losses.append(float(loss))
        if config.verbose:
            msg = f"[{epoch}] train l2 {np.mean(losses):.5f}"
            if (epoch + 1) % config.eval_interval == 0:
                msg += f" test l2 {eval_test():.5f}"
            print(msg, flush=True)

    print(f"final test l2: {eval_test():.5f}")
    return params


if __name__ == "__main__":
    main()
