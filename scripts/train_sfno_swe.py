"""Train SFNO on spherical shallow-water dynamics.

Counterpart of /root/reference/examples/models/plot_SFNO_swe.py and
scripts/train_mhd64.py-style spherical workloads, using the in-package
spherical SWE generator.
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_spherical_swe
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import SFNO
from neuraloperator_tpu.training import Trainer, adamw, setup, step_lr


@dataclass
class SWEConfig(ConfigBase):
    n_train: int = 32
    n_test: int = 8
    batch_size: int = 4
    nlat: int = 32
    nlon: int = 64
    n_modes: List[int] = field(default_factory=lambda: [16, 16])
    hidden_channels: int = 32
    n_layers: int = 4
    n_epochs: int = 20
    learning_rate: float = 1e-3
    verbose: bool = True


def main():
    config = make_config_from_cli(SWEConfig)
    setup()
    train_loader, test_loaders, _ = load_spherical_swe(
        n_train=config.n_train,
        n_test=config.n_test,
        batch_size=config.batch_size,
        test_batch_sizes=(config.batch_size,),
        train_resolution=(config.nlat, config.nlon),
        test_resolutions=((config.nlat, config.nlon),),
    )
    model = SFNO(
        n_modes=tuple(config.n_modes),
        in_channels=3,
        out_channels=3,
        hidden_channels=config.hidden_channels,
        n_layers=config.n_layers,
    )
    optimizer = adamw(
        step_lr(config.learning_rate, 10, 0.5, len(train_loader)),
        weight_decay=1e-4,
    )
    l2 = LpLoss(d=2)
    trainer = Trainer(
        model=model, n_epochs=config.n_epochs, verbose=config.verbose,
        eval_interval=5,
    )
    metrics = trainer.train(
        train_loader, test_loaders, optimizer, training_loss=l2,
        eval_losses={"l2": l2},
    )
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
