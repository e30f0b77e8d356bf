"""Train FNO/TFNO on 2-D Navier-Stokes (vorticity).

Counterpart of /root/reference/scripts/train_navier_stokes.py. Supports
multigrid patching and mesh-distributed training.

Usage:
    python scripts/train_navier_stokes.py --opt.n_epochs 50 \
        --model.factorization tucker --model.rank 0.1
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.config import (
    ConfigBase,
    DistributedConfig,
    FNOModelConfig,
    OptConfig,
    make_config_from_cli,
)
from neuraloperator_tpu.data.datasets import load_navier_stokes_pt
from neuraloperator_tpu.data.transforms import MGPatchingDataProcessor
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import get_model
from neuraloperator_tpu.training import Trainer, setup
from neuraloperator_tpu.utils import count_model_params


@dataclass
class NSDataConfig(ConfigBase):
    batch_size: int = 8
    n_train: int = 64
    train_resolution: int = 64
    n_tests: List[int] = field(default_factory=lambda: [16])
    test_resolutions: List[int] = field(default_factory=lambda: [64])
    test_batch_sizes: List[int] = field(default_factory=lambda: [8])
    encode_input: bool = True
    encode_output: bool = True


@dataclass
class PatchingConfig(ConfigBase):
    levels: int = 0
    padding: float = 0.078125
    stitching: bool = True


@dataclass
class NSConfig(ConfigBase):
    model: FNOModelConfig = field(default_factory=lambda: FNOModelConfig(
        n_modes=[24, 24], hidden_channels=32, projection_channel_ratio=4
    ))
    opt: OptConfig = field(default_factory=lambda: OptConfig(
        n_epochs=50, learning_rate=3e-4, step_size=20
    ))
    data: NSDataConfig = field(default_factory=NSDataConfig)
    patching: PatchingConfig = field(default_factory=PatchingConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    verbose: bool = True
    eval_interval: int = 1
    # stage the dataset in HBM and run one scan program per epoch
    # (amortizes per-step dispatch; single-device path)
    device_dataset: bool = False
    # max scan steps per epoch program (None = whole epoch in one);
    # the relayed worker crashes on very long single programs
    epoch_scan_chunk: Optional[int] = None
    save_dir: Optional[str] = None  # save best/final training state here
    save_best: Optional[str] = None  # metric name, e.g. '128_l2'
    save_every: Optional[int] = None  # periodic save interval (epochs)
    resume_from_dir: Optional[str] = None  # resume params/opt/epoch from here
    # params-only warm start (fine-tuning: fresh optimizer/schedule/epoch)
    warm_start_from: Optional[str] = None
    warm_start_name: str = "best_model"
    # also load the donor's optimizer.msgpack (same-distribution
    # fine-tunes: skips the warm-restart bump of a fresh Adam state)
    warm_start_opt: bool = False
    # pin normalizers to another checkpoint's data_processor.json instead
    # of refitting on this run's train split — REQUIRED when warm-starting
    # from a checkpoint trained on a different train file/subset, else the
    # stats delta shifts every input and the fine-tune wastes its budget
    # re-adapting (v3 lesson: a 0.23% std shift doubled eval l2)
    normalizer_from: Optional[str] = None


def main():
    config = make_config_from_cli(NSConfig)
    mesh = setup(config)

    train_loader, test_loaders, data_processor = load_navier_stokes_pt(
        n_train=config.data.n_train,
        n_tests=config.data.n_tests,
        batch_size=config.data.batch_size,
        test_batch_sizes=config.data.test_batch_sizes,
        train_resolution=config.data.train_resolution,
        test_resolutions=config.data.test_resolutions,
        encode_input=config.data.encode_input,
        encode_output=config.data.encode_output,
    )

    if config.normalizer_from is not None:
        from neuraloperator_tpu.data.transforms import load_data_processor

        pinned = load_data_processor(config.normalizer_from)
        if pinned is None:
            raise SystemExit(
                f"--normalizer_from {config.normalizer_from}: no "
                "data_processor.json sidecar found"
            )
        data_processor = pinned
        print(f"normalizers pinned from {config.normalizer_from}")

    if config.patching.levels > 0:
        data_processor = MGPatchingDataProcessor(
            levels=config.patching.levels,
            padding_fraction=config.patching.padding,
            stitching=config.patching.stitching,
            use_distributed=config.distributed.use_distributed,
            mesh=mesh,
            in_normalizer=data_processor.in_normalizer,
            out_normalizer=data_processor.out_normalizer,
        )
        # get_model multiplies data_channels by (levels+1) when the config
        # carries a patching section — no manual adjustment here

    model = get_model(config.to_dict())

    from neuraloperator_tpu.training.optimizer import build_optimizer

    optimizer = build_optimizer(config.opt, len(train_loader))
    h1loss, l2loss = H1Loss(d=2), LpLoss(d=2, p=2)
    trainer = Trainer(
        model=model,
        n_epochs=config.opt.n_epochs,
        data_processor=data_processor,
        eval_interval=config.eval_interval,
        mesh=mesh,
        mixed_precision=config.opt.mixed_precision,
        stochastic_rounding=config.opt.stochastic_rounding,
        verbose=config.verbose,
    )
    metrics = trainer.train(
        train_loader,
        test_loaders,
        optimizer,
        training_loss=h1loss if config.opt.training_loss == "h1" else l2loss,
        eval_losses={"h1": h1loss, "l2": l2loss},
        device_dataset=config.device_dataset,
        epoch_scan_chunk=config.epoch_scan_chunk,
        resume_from_dir=config.resume_from_dir,
        warm_start_from=config.warm_start_from,
        warm_start_name=config.warm_start_name,
        warm_start_opt=config.warm_start_opt,
        **(
            {
                "save_dir": config.save_dir,
                "save_best": config.save_best,
                "save_every": config.save_every or config.opt.n_epochs,
            }
            if config.save_dir
            else {}
        ),
    )
    if config.opt.ema_decay > 0:
        # second eval on the EMA-averaged params (reference has no EMA;
        # ours rides the optimizer state — training/optimizer.py::with_ema)
        from neuraloperator_tpu.training.optimizer import ema_params

        trainer.params = ema_params(trainer.opt_state)
        ev = trainer._build_eval_step({"h1": h1loss, "l2": l2loss})
        ema_metrics = trainer.evaluate_all(ev, test_loaders)
        print("ema:", {k: round(float(v), 5) for k, v in ema_metrics.items()})
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
        print("params:", count_model_params(trainer.params))
    return metrics


if __name__ == "__main__":
    main()
