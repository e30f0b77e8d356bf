"""Physics-informed training of FNO on Burgers (PINO).

Counterpart of /root/reference/scripts/train_burgers_pino.py: a custom
training loop (not Trainer) combining data loss, initial-condition loss and
the Burgers equation residual through an adaptive aggregator
(ReLoBRaLo or SoftAdapt), called as
``total_loss, weights = aggregator(loss_dict, step=epoch)``.
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import DataLoader, PTDataset
from neuraloperator_tpu.data.datasets.synthetic import (
    generate_burgers_spacetime_files,
)
from neuraloperator_tpu.losses import (
    BurgersEqnLoss,
    ICLoss,
    LpLoss,
    Relobralo,
    SoftAdapt,
)
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import adamw, setup


@dataclass
class PINOConfig(ConfigBase):
    n_train: int = 32
    n_test: int = 8
    batch_size: int = 8
    resolution: int = 16
    n_epochs: int = 30
    learning_rate: float = 1e-3
    visc: float = 0.05
    aggregator: str = "relobralo"  # or 'softadapt'
    verbose: bool = True


def main():
    config = make_config_from_cli(PINOConfig)
    setup()
    root = Path(__file__).parent.parent / (
        "neuraloperator_tpu/data/datasets/data"
    )
    if not (root / f"burgers_pino_train_{config.resolution}.pt").exists():
        generate_burgers_spacetime_files(
            root, n_train=max(config.n_train, 32), n_test=max(config.n_test, 8),
            res=config.resolution, visc=config.visc,
        )
    ds = PTDataset(
        root_dir=root,
        dataset_name="burgers_pino",
        n_train=config.n_train,
        n_tests=[config.n_test],
        batch_size=config.batch_size,
        test_batch_sizes=[config.batch_size],
        train_resolution=config.resolution,
        test_resolutions=[config.resolution],
        encode_input=False,
        encode_output=False,
    )
    train_loader = DataLoader(ds.train_db, config.batch_size, shuffle=True)
    test_loader = DataLoader(
        ds.test_dbs[config.resolution], config.batch_size
    )

    model = FNO(
        n_modes=(8, 8), in_channels=1, out_channels=1, hidden_channels=24,
        n_layers=4,
    )
    first = next(iter(train_loader))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(first["x"][:1])
    )["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(params)

    data_loss = LpLoss(d=2)
    ic_loss = ICLoss()
    eqn_loss = BurgersEqnLoss(visc=config.visc, domain_length=[1.0, 2 * np.pi])
    agg_cls = Relobralo if config.aggregator == "relobralo" else SoftAdapt
    aggregator = agg_cls(num_losses=3)

    @jax.jit
    def losses_and_grads(params, batch, weights):
        def total(p):
            out = model.apply({"params": p}, batch["x"])
            l_data = data_loss(out, batch["y"])
            l_ic = ic_loss(out, batch["y"])
            l_eqn = eqn_loss(out)
            return (
                weights[0] * l_data + weights[1] * l_ic + weights[2] * l_eqn,
                (l_data, l_ic, l_eqn),
            )

        (tot, parts), grads = jax.value_and_grad(total, has_aux=True)(params)
        return tot, parts, grads

    weights = jnp.ones(3)
    for epoch in range(config.n_epochs):
        tot_avg, n = 0.0, 0
        for batch in train_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            tot, parts, grads = losses_and_grads(params, batch, weights)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            tot_avg += float(tot)
            n += 1
        # adapt loss weights once per epoch from the last batch's parts
        loss_dict = {
            "data": parts[0], "ic": parts[1], "equation": parts[2]
        }
        _, weights = aggregator(loss_dict, step=epoch)
        weights = jnp.asarray(weights)
        if config.verbose:
            print(
                f"[{epoch}] total={tot_avg / max(n,1):.5f} "
                f"weights={np.round(np.asarray(weights), 3).tolist()} "
                f"parts={[round(float(p), 5) for p in parts]}"
            )

    # final eval
    l2 = LpLoss(d=2)
    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    errs = []
    for batch in test_loader:
        out = fwd(params, jnp.asarray(batch["x"]))
        errs.append(float(l2(out, jnp.asarray(batch["y"]))))
    print("test l2 (sum-reduced batches):", np.mean(errs))
    return params


if __name__ == "__main__":
    main()
