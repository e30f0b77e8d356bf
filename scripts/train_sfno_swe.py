"""Train SFNO on spherical shallow-water dynamics.

Counterpart of /root/reference/examples/models/plot_SFNO_swe.py
(n_train 200, batch 32, SFNO n_modes (16,32) hidden 64 2 layers with
domain padding, AdamW lr 5e-3 wd 1e-4, cosine annealing, sum-reduced L2,
zero-shot eval at 2x resolution (64,128)), using the in-package
spherical SWE generator.
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_spherical_swe
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import SFNO
from neuraloperator_tpu.training import Trainer, adamw, cosine_annealing, setup


@dataclass
class SWEConfig(ConfigBase):
    n_train: int = 200
    n_test: int = 40
    batch_size: int = 32
    nlat: int = 32
    nlon: int = 64
    # zero-shot super-resolution eval at 2x is part of the reference recipe
    test_resolutions: List[List[int]] = field(
        default_factory=lambda: [[32, 64], [64, 128]]
    )
    n_modes: List[int] = field(default_factory=lambda: [16, 32])
    hidden_channels: int = 64
    n_layers: int = 2
    domain_padding: float = 0.05
    n_epochs: int = 20
    learning_rate: float = 5e-3
    save_dir: Optional[str] = None
    save_every: int = 25
    verbose: bool = True


def main():
    config = make_config_from_cli(SWEConfig)
    setup()
    test_resolutions = [tuple(r) for r in config.test_resolutions]
    train_loader, test_loaders, _ = load_spherical_swe(
        n_train=config.n_train,
        n_test=config.n_test,
        batch_size=config.batch_size,
        test_batch_sizes=(config.batch_size,) * len(test_resolutions),
        train_resolution=(config.nlat, config.nlon),
        test_resolutions=test_resolutions,
    )
    model = SFNO(
        n_modes=tuple(config.n_modes),
        in_channels=3,
        out_channels=3,
        hidden_channels=config.hidden_channels,
        n_layers=config.n_layers,
        domain_padding=config.domain_padding or None,
    )
    optimizer = adamw(
        cosine_annealing(
            config.learning_rate, config.n_epochs, len(train_loader)
        ),
        weight_decay=1e-4,
    )
    l2 = LpLoss(d=2, reduction="sum")
    trainer = Trainer(
        model=model, n_epochs=config.n_epochs, verbose=config.verbose,
        eval_interval=5,
    )
    save_kwargs = (
        {"save_dir": config.save_dir, "save_every": config.save_every}
        if config.save_dir
        else {}
    )
    metrics = trainer.train(
        train_loader, test_loaders, optimizer, training_loss=l2,
        eval_losses={"l2": LpLoss(d=2, reduction="mean")},
        **save_kwargs,
    )
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
