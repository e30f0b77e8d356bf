"""Train an FNO on Darcy flow.

TPU-native counterpart of /root/reference/scripts/train_darcy.py:
config -> mesh setup -> data -> model -> optimizer -> Trainer.train.

Usage:
    python scripts/train_darcy.py --opt.n_epochs 50 --model.hidden_channels 32
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from neuraloperator_tpu.config import DarcyConfig, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import get_model
from neuraloperator_tpu.parallel import mesh as mesh_lib
from neuraloperator_tpu.training import Trainer
from neuraloperator_tpu.utils import count_model_params


def main():
    config = make_config_from_cli(DarcyConfig)

    mesh = None
    if config.distributed.use_distributed:
        mesh = mesh_lib.init(config.distributed.model_parallel_size)

    n_train = config.data.n_train
    train_loader, test_loaders, data_processor = load_darcy_flow_small(
        n_train=n_train,
        n_tests=config.data.n_tests,
        batch_size=config.data.batch_size,
        test_batch_sizes=config.data.test_batch_sizes,
        test_resolutions=config.data.test_resolutions,
        encode_input=config.data.encode_input,
        encode_output=config.data.encode_output,
    )

    model = get_model(config.to_dict())

    from neuraloperator_tpu.training.optimizer import build_optimizer

    optimizer = build_optimizer(config.opt, len(train_loader))

    l2loss = LpLoss(d=2, p=2)
    h1loss = H1Loss(d=2)
    train_loss = h1loss if config.opt.training_loss == "h1" else l2loss

    trainer = Trainer(
        model=model,
        n_epochs=config.opt.n_epochs,
        data_processor=data_processor,
        mixed_precision=config.opt.mixed_precision,
        stochastic_rounding=config.opt.stochastic_rounding,
        eval_interval=config.eval_interval,
        mesh=mesh,
        verbose=config.verbose,
    )
    metrics = trainer.train(
        train_loader=train_loader,
        test_loaders=test_loaders,
        optimizer=optimizer,
        training_loss=train_loss,
        eval_losses={"h1": h1loss, "l2": l2loss},
    )
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
        n_params = count_model_params(trainer.params)
        print(f"model parameters: {n_params}")
    return metrics


if __name__ == "__main__":
    main()
