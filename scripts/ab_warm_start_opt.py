"""A/B: does warm_start_opt=True remove the warm-restart bump?

Trains a small Darcy FNO to convergence (donor), then fine-tunes it
twice at a low lr on the same distribution — once with a FRESH optimizer
state (plain warm start) and once loading the donor's optimizer.msgpack
(``warm_start_opt=True``). Records the per-eval trajectory of both arms.

Motivation: BASELINE.md round-5 v3c — a converged 2.32e-4 NS flagship
warm-started with a fresh factored-Adam state at lr 2e-5 regressed to
2.65e-4 and had not recovered 40 epochs later. The donor's second-moment
statistics remain valid on same-distribution data; loading them should
start the fine-tune AT the donor's quality instead of below it.

Reference behavioral contract: the reference trainer's resume logic
restores optimizer state with params (neuralop/training/trainer.py
resume + training_state.py save_training_state); warm_start_opt is the
TPU repo's split of that into a fine-tune-friendly form.

Usage (CPU-friendly; ~2-4 min):
  python scripts/ab_warm_start_opt.py [--epochs_donor 40] [--epochs_ft 12]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(epochs_donor: int, epochs_ft: int, out_path: str):
    from neuraloperator_tpu.data.datasets import load_darcy_flow_small
    from neuraloperator_tpu.losses import H1Loss, LpLoss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import Trainer, adamw

    train_loader, test_loaders, dp = load_darcy_flow_small(
        n_train=800, n_tests=[200], batch_size=16,
        test_batch_sizes=[32], test_resolutions=[16],
    )
    h1, l2 = H1Loss(d=2), LpLoss(d=2)

    def make_model():
        return FNO(
            n_modes=(12, 12), in_channels=1, out_channels=1,
            hidden_channels=24, n_layers=4,
        )

    tmp = Path(tempfile.mkdtemp(prefix="ab_wso_"))
    donor_dir = tmp / "donor"

    donor = Trainer(
        model=make_model(), n_epochs=epochs_donor, data_processor=dp,
        eval_interval=epochs_donor, verbose=False,
    )
    donor_metrics = donor.train(
        train_loader, test_loaders, adamw(3e-3, weight_decay=1e-4),
        training_loss=h1, eval_losses={"l2": l2},
        save_every=epochs_donor, save_dir=donor_dir,
    )
    donor_l2 = float(donor_metrics["16_l2"])
    print(f"donor converged: 16_l2 {donor_l2:.5f}", flush=True)

    def finetune(load_opt: bool):
        ft = Trainer(
            model=make_model(), n_epochs=epochs_ft, data_processor=dp,
            eval_interval=1, verbose=False,
        )
        traj = []
        orig_eval = ft.evaluate_all

        def tracking_eval(*a, **k):
            m = orig_eval(*a, **k)
            if "16_l2" in m:
                traj.append(round(float(m["16_l2"]), 6))
            return m

        ft.evaluate_all = tracking_eval
        ft.train(
            train_loader, test_loaders,
            adamw(1e-4, weight_decay=1e-4),
            training_loss=h1, eval_losses={"l2": l2},
            warm_start_from=donor_dir, warm_start_name="model",
            warm_start_opt=load_opt,
        )
        return traj

    traj_fresh = finetune(load_opt=False)
    traj_loaded = finetune(load_opt=True)

    result = {
        "run": "ab_warm_start_opt",
        "task": "darcy16, donor lr 3e-3 -> fine-tune lr 1e-4, same data",
        "donor_16_l2": round(donor_l2, 6),
        "ft_fresh_opt_16_l2_per_epoch": traj_fresh,
        "ft_loaded_opt_16_l2_per_epoch": traj_loaded,
        "bump_fresh": round(max(traj_fresh) - donor_l2, 6),
        "bump_loaded": round(max(traj_loaded) - donor_l2, 6),
    }
    print(json.dumps(result), flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs_donor", type=int, default=40)
    p.add_argument("--epochs_ft", type=int, default=12)
    p.add_argument("--out", type=str, default="artifacts/results.jsonl")
    args = p.parse_args()
    run(args.epochs_donor, args.epochs_ft, args.out)
