"""Generate the reference-formulation Navier-Stokes (nsforcing) dataset.

Forced 2-D NS vorticity trajectories (visc 1e-3, T=50, snapshots every 1.0
time unit, GRF(2.5, 7) initial conditions — the scheme behind the
reference's Zenodo nsforcing data, cf. reference
``neuralop/data/datasets/navier_stokes.py:15-117`` and
``config/navier_stokes_config.py:20-30`` n_train=10000).

Writes, under the package data dir (or --out):
  - ``ns_raw/nsforcing_traj_{split}_{res}.npy``  (n_traj, n_snap, res, res)
    raw trajectories (consumed by rollout training);
  - ``nsforcing_{split}_{res}.pt``  x/y single-step pairs (w_t -> w_{t+1}),
    the PTDataset layout the NS loader reads.

The solver is batched+jitted on the accelerator (one XLA program per
trajectory block); ~200 trajectories at 128^2 generate 10k pairs.

Usage:
  python scripts/generate_ns_data.py --res 128 --train-traj 200 --test-traj 40
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def stream_split(out_dir, raw_dir, split, n_traj, res, args, seed):
    from neuraloperator_tpu.data.datasets.ns_solver import (
        generate_nsforcing_trajectories,
        trajectories_to_pairs,
    )

    n_snap = int(round(args.T / args.record_dt)) + 1
    raw_path = raw_dir / f"nsforcing_traj_{split}_{res}.npy"
    traj_mm = np.lib.format.open_memmap(
        raw_path, mode="w+", dtype=np.float32, shape=(n_traj, n_snap, res, res)
    )
    done = 0
    t0 = time.time()
    for block in generate_nsforcing_trajectories(
        n_traj,
        res,
        visc=args.visc,
        T=args.T,
        dt=args.dt,
        record_dt=args.record_dt,
        seed=seed,
        batch=args.batch,
    ):
        if np.isnan(block).any():
            raise RuntimeError(f"NaN in trajectory block at {done}")
        traj_mm[done : done + block.shape[0]] = block
        traj_mm.flush()
        done += block.shape[0]
        print(
            f"[{split}] {done}/{n_traj} trajectories "
            f"({time.time()-t0:.0f}s, max|w|={np.abs(block).max():.2f})",
            flush=True,
        )
    xs, ys = trajectories_to_pairs(np.asarray(traj_mm))
    # shuffle so any n_train prefix drawn by PTDataset spans many
    # trajectories (pairs from one trajectory are correlated)
    perm = np.random.default_rng(seed + 1).permutation(len(xs))
    xs, ys = np.ascontiguousarray(xs[perm]), np.ascontiguousarray(ys[perm])
    import torch

    torch.save(
        {"x": torch.from_numpy(xs), "y": torch.from_numpy(ys)},
        (out_dir / f"nsforcing_{split}_{res}.pt").as_posix(),
    )
    print(
        f"[{split}] wrote {xs.shape[0]} pairs -> nsforcing_{split}_{res}.pt",
        flush=True,
    )


def main():
    import jax

    # remote TPU compiles are slow; cache compiled programs across runs
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/neuraloperator_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--train-traj", type=int, default=200)
    p.add_argument("--test-traj", type=int, default=40)
    p.add_argument("--visc", type=float, default=1e-3)
    p.add_argument("--T", type=float, default=50.0)
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--record-dt", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    out_dir = (
        Path(args.out)
        if args.out
        else Path(__file__).resolve().parents[1]
        / "neuraloperator_tpu/data/datasets/data"
    )
    raw_dir = out_dir / "ns_raw"
    raw_dir.mkdir(parents=True, exist_ok=True)

    if args.train_traj > 0:
        stream_split(
            out_dir, raw_dir, "train", args.train_traj, args.res, args,
            seed=args.seed,
        )
    if args.test_traj > 0:
        stream_split(
            out_dir, raw_dir, "test", args.test_traj, args.res, args,
            seed=args.seed + 10_000,
        )


if __name__ == "__main__":
    main()
