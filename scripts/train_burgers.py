"""Train FNO-1D on Burgers' equation.

Counterpart of /root/reference/scripts/train_burgers.py.
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.config import (
    ConfigBase,
    DistributedConfig,
    FNOModelConfig,
    OptConfig,
    make_config_from_cli,
)
from neuraloperator_tpu.data.datasets import load_burgers_1d
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import get_model
from neuraloperator_tpu.training import Trainer, adamw, setup, step_lr


@dataclass
class BurgersDataConfig(ConfigBase):
    batch_size: int = 16
    n_train: int = 100
    train_resolution: int = 16
    n_tests: List[int] = field(default_factory=lambda: [50])
    test_resolutions: List[int] = field(default_factory=lambda: [16])
    test_batch_sizes: List[int] = field(default_factory=lambda: [16])


@dataclass
class BurgersConfig(ConfigBase):
    model: FNOModelConfig = field(default_factory=lambda: FNOModelConfig(
        n_modes=[8], hidden_channels=24
    ))
    opt: OptConfig = field(default_factory=lambda: OptConfig(
        n_epochs=30, learning_rate=1e-2, step_size=10
    ))
    data: BurgersDataConfig = field(default_factory=BurgersDataConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    verbose: bool = True
    eval_interval: int = 5


def main():
    config = make_config_from_cli(BurgersConfig)
    mesh = setup(config)
    train_loader, test_loaders, data_processor = load_burgers_1d(
        n_train=config.data.n_train,
        n_tests=config.data.n_tests,
        batch_size=config.data.batch_size,
        test_batch_sizes=config.data.test_batch_sizes,
        train_resolution=config.data.train_resolution,
        test_resolutions=config.data.test_resolutions,
    )
    model = get_model(config.to_dict())
    optimizer = adamw(
        step_lr(
            config.opt.learning_rate,
            config.opt.step_size,
            config.opt.gamma,
            len(train_loader),
        ),
        weight_decay=config.opt.weight_decay,
    )
    h1loss, l2loss = H1Loss(d=1), LpLoss(d=1, p=2)
    trainer = Trainer(
        model=model,
        n_epochs=config.opt.n_epochs,
        data_processor=data_processor,
        eval_interval=config.eval_interval,
        mesh=mesh,
        verbose=config.verbose,
    )
    metrics = trainer.train(
        train_loader,
        test_loaders,
        optimizer,
        training_loss=h1loss if config.opt.training_loss == "h1" else l2loss,
        eval_losses={"h1": h1loss, "l2": l2loss},
    )
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
