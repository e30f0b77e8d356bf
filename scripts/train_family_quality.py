"""Converged Darcy-flow quality runs for the grid model families that
have no dedicated reference training script (UNO, LocalNO, CODANO).

The reference validates these families with unit smokes only; here each
one trains on the full small-Darcy recipe (the same data/loss/schedule
class as ``scripts/train_darcy.py``, reference
``/root/reference/config/darcy_config.py:10-43``) so BASELINE.md can
record converged train/test losses per family next to FNO's 16_l2 0.094.

Usage:
    python scripts/train_family_quality.py --family uno \
        --n_train 1000 --n_epochs 300
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import CODANO, UNO, LocalNO
from neuraloperator_tpu.training import Trainer, adamw, step_lr
from neuraloperator_tpu.utils import count_model_params


def build_model(family: str, res: int, hvc: int = 32, token_dim: int = 8):
    if family == "uno":
        return UNO(
            in_channels=1, out_channels=1, hidden_channels=32,
            lifting_channels=64, projection_channels=64, n_layers=5,
            uno_out_channels=(16, 32, 32, 32, 16),
            uno_n_modes=((8, 8),) * 5,
            uno_scalings=((1, 1), (0.5, 0.5), (1, 1), (2, 2), (1, 1)),
            channel_mlp_skip="linear",
        )
    if family == "local_no":
        return LocalNO(
            n_modes=(16, 16), in_channels=1, out_channels=1,
            hidden_channels=24, n_layers=4,
            default_in_shape=(res, res),
        )
    if family == "codano":
        return CODANO(
            n_modes=((12, 12),) * 4, n_layers=4,
            hidden_variable_codimension=hvc,
            lifting_channels=64, projection_channels=64,
            per_channel_attention=False, attention_token_dim=token_dim,
            domain_padding=None,
        )
    raise ValueError(family)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["uno", "local_no", "codano"])
    ap.add_argument("--n_train", type=int, default=1000)
    ap.add_argument("--n_epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=None,
                    help="default: 3e-3 (uno/local_no), 1e-3 (codano)")
    ap.add_argument("--step_size", type=int, default=60)
    ap.add_argument("--eval_interval", type=int, default=25)
    # CODANO capacity knobs (defaults reproduce the recorded row)
    ap.add_argument("--hidden_variable_codimension", type=int, default=32)
    ap.add_argument("--attention_token_dim", type=int, default=8)
    args = ap.parse_args()

    res = 16
    # CODANO's output lives in the input's codomain, so the (encoded)
    # input normalization must match the target field scale: encode both.
    train_loader, test_loaders, data_processor = load_darcy_flow_small(
        n_train=args.n_train, n_tests=[100, 50],
        batch_size=args.batch_size, test_batch_sizes=[16, 16],
        test_resolutions=[16, 32],
        encode_input=(args.family == "codano"), encode_output=True,
    )
    model = build_model(
        args.family, res,
        hvc=args.hidden_variable_codimension,
        token_dim=args.attention_token_dim,
    )
    lr = args.learning_rate or (1e-3 if args.family == "codano" else 3e-3)
    schedule = step_lr(lr, args.step_size, 0.5, len(train_loader))
    optimizer = adamw(schedule, weight_decay=1e-4)
    h1, l2 = H1Loss(d=2), LpLoss(d=2, p=2)
    trainer = Trainer(
        model=model, n_epochs=args.n_epochs,
        data_processor=data_processor,
        eval_interval=args.eval_interval, verbose=True,
    )
    t0 = time.time()
    metrics = trainer.train(
        train_loader=train_loader, test_loaders=test_loaders,
        optimizer=optimizer, training_loss=h1,
        eval_losses={"h1": h1, "l2": l2},
    )
    out = {
        "family": args.family,
        "n_params": int(count_model_params(trainer.params)),
        "n_train": args.n_train,
        "n_epochs": args.n_epochs,
        "wall_s": round(time.time() - t0, 1),
    }
    out.update({k: round(float(v), 5) for k, v in metrics.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
