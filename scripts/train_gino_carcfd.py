"""Train GINO on car-CFD surface pressure (mini car dataset).

Counterpart of /root/reference/scripts/train_gino_carcfd.py: point-cloud
geometry -> latent-grid FNO -> pressure at surface vertices. Uses a custom
loop because each mesh has its own neighbor structure (precomputed on the
host, the TPU-native pipeline).

Usage (flat flags — this script uses a custom loop, not Trainer):
    python scripts/train_gino_carcfd.py --n_epochs 20 --latent_n 16 --radius 0.25
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
from neuraloperator_tpu.models import GINO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class CarConfig(ConfigBase):
    n_epochs: int = 20
    learning_rate: float = 1e-3
    latent_n: int = 16
    radius: float = 0.25
    max_neighbors: int = 32
    verbose: bool = True
    # 'mini' = the reference's shipped 3-sample mini_car.pt;
    # 'synthetic' = in-package deformed-ellipsoid potential-flow dataset
    # (data/datasets/synthetic_cfd.py) at n_train/n_test scale
    data_source: str = "mini"
    n_train: int = 100
    n_test: int = 20
    eval_interval: int = 10


def _load_samples(config):
    if config.data_source == "synthetic":
        from neuraloperator_tpu.data.datasets import load_synthetic_cfd

        samples = load_synthetic_cfd(config.n_train + config.n_test)
        return samples[: config.n_train], samples[config.n_train :]
    samples = load_mini_car()
    return samples[:2], samples[2:]


def main():
    config = make_config_from_cli(CarConfig)
    setup()
    train, test = _load_samples(config)

    n = config.latent_n
    axes = [np.linspace(0, 1, n)] * 3
    latent_queries = np.stack(
        np.meshgrid(*axes, indexing="ij"), axis=-1
    )[None].astype(np.float32)

    model = GINO(
        in_channels=1,
        out_channels=1,
        fno_in_channels=1,
        gno_coord_dim=3,
        in_gno_radius=config.radius,
        out_gno_radius=config.radius,
        fno_n_modes=(8, 8, 8),
        fno_hidden_channels=32,
        fno_n_layers=4,
        gno_max_neighbors=config.max_neighbors,
    )

    def prep(sample):
        verts = sample["vertices"].astype(np.float32)
        # normalize geometry into the unit cube
        lo, hi = verts.min(0), verts.max(0)
        verts = (verts - lo) / (hi - lo + 1e-9)
        press = sample["press"].astype(np.float32)  # (1, n_verts)
        x = np.ones((1, len(verts), 1), np.float32)
        return (
            jnp.asarray(verts[None]),
            jnp.asarray(latent_queries),
            jnp.asarray(verts[None]),
            jnp.asarray(x),
            jnp.asarray(press.T[None]),  # (1, n_verts, 1)
        )

    batches = [prep(s) for s in train]
    first = batches[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), first[0], first[1], first[2], first[3]
    )["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)
    l2 = LpLoss(d=1)

    @jax.jit
    def step(params, opt_state, geom, lq, oq, x, y):
        def loss_fn(p):
            out = model.apply({"params": p}, geom, lq, oq, x)
            return l2(jnp.transpose(out, (0, 2, 1)), jnp.transpose(y, (0, 2, 1)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fwd = jax.jit(
        lambda p, a, b, c, d: model.apply({"params": p}, a, b, c, d)
    )
    test_batches = [prep(s) for s in test]

    def eval_test():
        errs = []
        for geom, lq, oq, x, y in test_batches:
            out = fwd(params, geom, lq, oq, x)
            errs.append(float(
                l2(jnp.transpose(out, (0, 2, 1)), jnp.transpose(y, (0, 2, 1)))
            ))
        return float(np.mean(errs))

    for epoch in range(config.n_epochs):
        losses = []
        for geom, lq, oq, x, y in batches:
            params, opt_state, loss = step(params, opt_state, geom, lq, oq, x, y)
            losses.append(float(loss))
        if config.verbose:
            msg = f"[{epoch}] train l2 {np.mean(losses):.5f}"
            if (epoch + 1) % config.eval_interval == 0:
                msg += f" test l2 {eval_test():.5f}"
            print(msg, flush=True)

    final = eval_test()
    print(f"final test l2: {final:.5f}")
    return params


if __name__ == "__main__":
    main()
