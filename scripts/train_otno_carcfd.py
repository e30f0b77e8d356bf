"""Train OTNO on car-CFD surface pressure via optimal transport.

Counterpart of /root/reference/scripts/train_otno_carcfd.py: a spherical
latent grid is transported onto the car mesh with Sinkhorn OT; the FNO runs
on the transported features and the output is gathered back to the mesh.

Usage (flat flags — this script uses a custom loop, not Trainer):
    python scripts/train_otno_carcfd.py --n_epochs 30 --learning_rate 1e-3
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
from neuraloperator_tpu.data.datasets import OTDataModule, load_mini_car
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import OTNO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class OTConfig(ConfigBase):
    n_epochs: int = 30
    learning_rate: float = 1e-3
    latent_size: int = 24
    reg: float = 5e-3
    verbose: bool = True
    # 'mini' = shipped 3-sample mini_car.pt; 'synthetic' = in-package
    # deformed-ellipsoid potential-flow dataset at n_train/n_test scale
    data_source: str = "mini"
    n_train: int = 100
    n_test: int = 20
    eval_interval: int = 10


def main():
    config = make_config_from_cli(OTConfig)
    setup()
    if config.data_source == "synthetic":
        from neuraloperator_tpu.data.datasets import load_synthetic_cfd

        samples = load_synthetic_cfd(config.n_train + config.n_test)
        train, test = samples[: config.n_train], samples[config.n_train :]
    else:
        samples = load_mini_car()
        train, test = samples[:2], samples[2:]

    def prep(sample):
        verts = sample["vertices"].astype(np.float32)
        center = verts.mean(0)
        scale = np.abs(verts - center).max()
        verts = (verts - center) / scale
        dm = OTDataModule(
            verts, latent_size=config.latent_size, reg=config.reg, n_iters=200
        )
        feats = dm.transported_features(verts)  # (1, 6, s, s)
        press = sample["press"].astype(np.float32)  # (1, n_verts)
        return (
            jnp.asarray(feats),
            jnp.asarray(dm.ind_dec),
            jnp.asarray(press),
        )

    batches = [prep(s) for s in train]
    model = OTNO(
        n_modes=(12, 12),
        in_channels=6,
        out_channels=1,
        hidden_channels=32,
        n_layers=4,
    )
    x0, ind0, _ = batches[0]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, ind0)["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)
    l2 = LpLoss(d=1)

    @jax.jit
    def step(params, opt_state, x, ind_dec, y):
        def loss_fn(p):
            out = model.apply({"params": p}, x, ind_dec)  # (1, n_verts)
            return l2(out[None], y[None])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
    test_batches = [prep(s) for s in test]

    def eval_test():
        return float(np.mean([
            float(l2(fwd(params, x, ind)[None], y[None]))
            for x, ind, y in test_batches
        ]))

    for epoch in range(config.n_epochs):
        losses = []
        for x, ind_dec, y in batches:
            params, opt_state, loss = step(params, opt_state, x, ind_dec, y)
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
