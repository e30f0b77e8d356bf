"""Zero-shot super-resolution evaluation of a saved NS model.

Evaluates a trained (e.g. 128²-trained) FNO on single-step pairs built
from RAW nsforcing test trajectories at other resolutions, using the
training resolution's (channel-wise, hence resolution-independent)
normalizers — the discretization-invariance measurement
(reference analogue: evaluating `test_resolutions` beyond the training
resolution in the Darcy/NS configs).

Usage:
  python scripts/eval_ns_superres.py --save_dir runs/ns128_flagship \
      --train_res 128 --eval_res '[128,256]'
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_navier_stokes_pt
from neuraloperator_tpu.data.datasets.ns_solver import trajectories_to_pairs
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import setup
from neuraloperator_tpu.training.training_state import load_training_state


@dataclass
class SRConfig(ConfigBase):
    save_dir: str = "runs/ns128_flagship"
    save_name: str = "best_model"
    train_res: int = 128
    eval_res: List[int] = field(default_factory=lambda: [128, 256])
    max_pairs: int = 256
    batch: int = 8
    n_modes: int = 64
    hidden_channels: int = 64
    projection_channel_ratio: int = 4


def main():
    config = make_config_from_cli(SRConfig)
    setup()
    # Prefer the normalizer statistics persisted with the checkpoint
    # (data_processor.json, written by Trainer): a refit from a subset
    # (or from a since-extended train file) measurably shifts eval at
    # flagship error levels (~1e-4 rel l2).
    from neuraloperator_tpu.data.transforms import load_data_processor

    dp = load_data_processor(config.save_dir)
    if dp is not None:
        print(f"using saved normalizers from {config.save_dir}")
    else:
        # fallback for pre-sidecar checkpoints: refit channel-wise
        # (resolution-free) stats at the training resolution
        _, _, dp = load_navier_stokes_pt(
            n_train=256, n_tests=[8], batch_size=8, test_batch_sizes=[8],
            train_resolution=config.train_res,
            test_resolutions=[config.train_res],
        )

    model = FNO(
        n_modes=(config.n_modes, config.n_modes),
        in_channels=1, out_channels=1,
        hidden_channels=config.hidden_channels,
        projection_channel_ratio=config.projection_channel_ratio,
    )
    x0 = jnp.zeros((1, 1, config.train_res, config.train_res), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    params, _, epoch = load_training_state(
        config.save_dir, config.save_name, template
    )
    print(f"loaded {config.save_name} (epoch {epoch})")

    l2, h1 = LpLoss(d=2, reduction="mean"), H1Loss(d=2, reduction="mean")
    data_dir = (
        Path(__file__).resolve().parents[1]
        / "neuraloperator_tpu/data/datasets/data/ns_raw"
    )

    @jax.jit
    def eval_batch(params, x, y):
        sample = dp.preprocess({"x": x}, train=False)
        out = model.apply({"params": params}, sample["x"])
        out, _ = dp.postprocess(out, sample, train=False)
        return l2(out, y), h1(out, y)

    for res in config.eval_res:
        path = data_dir / f"nsforcing_traj_test_{res}.npy"
        if not path.exists():
            print(f"[{res}] missing {path.name} — generate with "
                  f"generate_ns_data.py --res {res} --train-traj 0")
            continue
        traj = np.asarray(np.load(path, mmap_mode="r"), np.float32)
        xs, ys = trajectories_to_pairs(traj)
        xs, ys = xs[: config.max_pairs], ys[: config.max_pairs]
        tot_l2 = tot_h1 = n = 0.0
        for i in range(0, len(xs), config.batch):
            xb = jnp.asarray(xs[i : i + config.batch][:, None])
            yb = jnp.asarray(ys[i : i + config.batch][:, None])
            a, b = eval_batch(params, xb, yb)
            tot_l2 += float(a) * len(xb)
            tot_h1 += float(b) * len(xb)
            n += len(xb)
        print(f"[{res}] pairs={int(n)} rel_l2={tot_l2/n:.5f} "
              f"rel_h1={tot_h1/n:.5f}", flush=True)


if __name__ == "__main__":
    main()
