"""Reconstruct data_processor.json sidecars for pre-sidecar flagship checkpoints.

Trainer now persists fitted normalizer statistics with every checkpoint
(training_state.save_training_state), but the v1/v2/v3 flagship runs
predate the sidecar. Their train-split statistics are exactly
recoverable because the 40k train file is the seed-777 shuffle of
[20k base ; 20k extension] (scripts/merge_ns_train_data.py):

- v3 (artifacts/ns128_v3): fit on the full 40k file (n_train=40000)
- v2 (artifacts/ns128_v2): fit on the 20k base subset (rows i of the
  merged file where perm[i] < 20000 — one-shot mean/var is order-free)
- v1 (artifacts/ns128_f32): fit on the first 10k of the base in its
  original order (base[argsort of perm positions][:10000])

Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/reconstruct_normalizer_sidecars.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import torch

from neuraloperator_tpu.data.transforms import (
    DefaultDataProcessor,
    UnitGaussianNormalizer,
)

ROOT = Path(__file__).resolve().parents[1]
DATA = ROOT / "neuraloperator_tpu/data/datasets/data/nsforcing_train_128.pt"
N_BASE = 20000
SHUFFLE_SEED = 777


def fit_dp(x, y):
    x = np.expand_dims(np.asarray(x, np.float32), 1)
    y = np.expand_dims(np.asarray(y, np.float32), 1)
    return DefaultDataProcessor(
        in_normalizer=UnitGaussianNormalizer(dim=[0, 2, 3]).fit(x),
        out_normalizer=UnitGaussianNormalizer(dim=[0, 2, 3]).fit(y),
    )


def write(dp, save_dir):
    path = ROOT / save_dir / "data_processor.json"
    path.write_text(json.dumps(dp.state_dict()))
    m = dp.in_normalizer.mean.ravel()
    s = dp.in_normalizer.std.ravel()
    print(f"{path}: in mean={m} std={s}")


def main():
    d = torch.load(DATA, weights_only=True, mmap=True)
    x = d["x"].numpy()
    y = d["y"].numpy()
    n = len(x)
    print(f"train file: {n} pairs")

    write(fit_dp(x, y), "artifacts/ns128_v3")

    if n == N_BASE + 20000:
        perm = np.random.default_rng(SHUFFLE_SEED).permutation(n)
        # merged[i] = concat[perm[i]]; base item perm[i]=k sits at row i.
        # Recover the base in ORIGINAL order: row index of base item k is
        # inv[k] where inv = argsort(perm).
        inv = np.argsort(perm)
        base_rows = inv[:N_BASE]  # rows holding base items 0..N_BASE-1
        xb, yb = x[base_rows], y[base_rows]
        write(fit_dp(xb, yb), "artifacts/ns128_v2")
        write(fit_dp(xb[:10000], yb[:10000]), "artifacts/ns128_f32")
    else:
        print("train file is not the 40k merge; skipping v2/v1 sidecars")


if __name__ == "__main__":
    main()
