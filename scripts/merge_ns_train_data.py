"""Merge an extension nsforcing train set into the canonical train file.

Round-5 quality push (VERDICT round-4 #8): the round-3 scaling curve
(l2 ~ n^-0.36, BASELINE.md) says more data is the binding lever at
flagship quality, so we extend the 20k-pair training set (400
trajectories, seed 0) with freshly generated trajectories at a disjoint
seed and re-shuffle with a fixed rng so any n_train prefix spans both
generations. The canonical file keeps its name — the exact regeneration
recipe lives in artifacts/README.md.

Usage:
  python scripts/merge_ns_train_data.py --ext-dir <dir> [--res 128]
"""

import argparse
from pathlib import Path

import numpy as np
import torch

DATA_DIR = Path(__file__).resolve().parents[1] / (
    "neuraloperator_tpu/data/datasets/data"
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ext-dir", required=True,
                   help="dir holding the extension nsforcing_train_{res}.pt")
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--shuffle-seed", type=int, default=777)
    args = p.parse_args()

    base_path = DATA_DIR / f"nsforcing_train_{args.res}.pt"
    ext_path = Path(args.ext_dir) / f"nsforcing_train_{args.res}.pt"
    base = torch.load(base_path.as_posix(), weights_only=True)
    ext = torch.load(ext_path.as_posix(), weights_only=True)

    x = np.concatenate([base["x"].numpy(), ext["x"].numpy()])
    y = np.concatenate([base["y"].numpy(), ext["y"].numpy()])
    perm = np.random.default_rng(args.shuffle_seed).permutation(len(x))
    x, y = np.ascontiguousarray(x[perm]), np.ascontiguousarray(y[perm])

    tmp = base_path.with_suffix(".pt.tmp")
    torch.save({"x": torch.from_numpy(x), "y": torch.from_numpy(y)},
               tmp.as_posix())
    tmp.rename(base_path)
    print(f"merged {len(base['x'])} + {len(ext['x'])} -> {len(x)} pairs "
          f"at {base_path}")


if __name__ == "__main__":
    main()
