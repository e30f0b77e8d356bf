"""Evaluate a saved NS checkpoint on the .pt test split — the same
measurement the Trainer logs during training (rel L2/H1 at the test
resolution), reproducible standalone.

Uses the checkpoint's persisted normalizer sidecar (data_processor.json)
by default so the number matches the training run that wrote the
checkpoint; ``--normalizer_from`` evaluates under ANOTHER checkpoint's
sidecar instead (for quantifying pipeline-normalizer mismatch).

Usage:
  python scripts/eval_ns_checkpoint.py --save_dir artifacts/ns128_v2 \
      [--save_name best_model] [--res 128] [--n_test 2000] [--batch 16] \
      [--normalizer_from artifacts/ns128_v3]
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets.pt_dataset import load_pt_as_numpy
from neuraloperator_tpu.data.transforms import load_data_processor
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import setup
from neuraloperator_tpu.training.training_state import load_training_state


@dataclass
class EvalConfig(ConfigBase):
    save_dir: str = "artifacts/ns128_v2"
    save_name: str = "best_model"
    normalizer_from: Optional[str] = None
    res: int = 128
    n_test: int = 2000
    batch: int = 16
    n_modes: int = 64
    hidden_channels: int = 64
    projection_channel_ratio: int = 4


def main():
    config = make_config_from_cli(EvalConfig)
    setup()
    dp_dir = config.normalizer_from or config.save_dir
    dp = load_data_processor(dp_dir)
    if dp is None:
        raise SystemExit(
            f"no data_processor.json under {dp_dir} — write one with "
            "scripts/reconstruct_normalizer_sidecars.py"
        )
    print(f"normalizers from {dp_dir} "
          f"(in std={np.ravel(dp.in_normalizer.std)})")

    model = FNO(
        n_modes=(config.n_modes, config.n_modes),
        in_channels=1, out_channels=1,
        hidden_channels=config.hidden_channels,
        projection_channel_ratio=config.projection_channel_ratio,
    )
    x0 = jnp.zeros((1, 1, config.res, config.res), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    params, _, _ = load_training_state(
        config.save_dir, config.save_name, template
    )

    data_dir = Path(__file__).resolve().parents[1] / (
        "neuraloperator_tpu/data/datasets/data"
    )
    test_pt = data_dir / f"nsforcing_test_{config.res}.pt"
    if not test_pt.exists():
        # fresh machine: the test split regenerates deterministically from
        # the seeded in-package solver (same seed convention as
        # scripts/generate_ns_data.py — test seed = 10_000), so a tracked
        # checkpoint can be re-evaluated anywhere with no data download
        print(f"{test_pt.name} missing — regenerating test split "
              "(seeded solver, deterministic)", flush=True)
        import subprocess

        subprocess.run(
            [sys.executable,
             str(Path(__file__).parent / "generate_ns_data.py"),
             "--res", str(config.res), "--train-traj", "0",
             "--test-traj", "40"],
            check=True,
        )
    data = load_pt_as_numpy(test_pt)
    xs = np.asarray(data["x"], np.float32)[: config.n_test, None]
    ys = np.asarray(data["y"], np.float32)[: config.n_test, None]

    l2, h1 = LpLoss(d=2, reduction="mean"), H1Loss(d=2, reduction="mean")

    @jax.jit
    def eval_batch(params, x, y):
        sample = dp.preprocess({"x": x}, train=False)
        out = model.apply({"params": params}, sample["x"])
        out, _ = dp.postprocess(out, sample, train=False)
        return l2(out, y), h1(out, y)

    tot_l2 = tot_h1 = n = 0.0
    for i in range(0, len(xs), config.batch):
        xb, yb = jnp.asarray(xs[i: i + config.batch]), jnp.asarray(
            ys[i: i + config.batch]
        )
        if len(xb) < config.batch:
            break  # drop ragged tail: one compiled program
        a, b = eval_batch(params, xb, yb)
        tot_l2 += float(a) * len(xb)
        tot_h1 += float(b) * len(xb)
        n += len(xb)
    print(
        f"{config.save_dir}/{config.save_name} @ {config.res}: "
        f"pairs={int(n)} rel_l2={tot_l2 / n:.6f} rel_h1={tot_h1 / n:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
