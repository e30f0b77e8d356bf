"""Bound the 128^2 NS solver's own discretization error (data provenance).

The flagship quality claims (BASELINE.md: 128_l2 ~6e-4) ride data generated
by the in-package pseudo-spectral solver (`data/datasets/ns_solver.py`,
analytically validated in `tests/test_ns_solver.py`). This script bounds the
*label error* of that data directly: for on-attractor states w_t drawn from
held-out raw trajectories, step the SAME state one snapshot interval
(Delta t = 1) with

  (a) the 128^2 solver (exactly how the training labels were made), and
  (b) a 2x-refined 256^2 solver (the state spectrally zero-padded up),
      spectrally truncated back to 128^2,

and report the relative L2 between the two next-step fields. That number is
the discretization error baked into every training label; the model-error
claim is meaningful only if it is not dominated by it.

Chaos note: forced NS at visc 1e-3 separates nearby trajectories over tens
of time units, so comparing whole T=50 trajectories would measure chaos,
not discretization. One snapshot interval (the training-pair horizon) is
the relevant scale.

Usage:
  python scripts/eval_solver_provenance.py --n-states 64
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def spectral_resample(w: np.ndarray, n_out: int) -> np.ndarray:
    """Spectrally up/down-sample (B, n, n) -> (B, n_out, n_out) (host numpy)."""
    n = w.shape[-1]
    spec = np.fft.fft2(w, axes=(-2, -1))
    out = np.zeros((*w.shape[:-2], n_out, n_out), dtype=spec.dtype)
    k = min(n, n_out) // 2
    idx = np.concatenate([np.arange(k), np.arange(-k, 0)])
    out[..., idx[:, None] % n_out, idx[None, :] % n_out] = spec[
        ..., idx[:, None] % n, idx[None, :] % n
    ]
    out *= (n_out / n) ** 2  # fft normalization
    res = np.fft.ifft2(out, axes=(-2, -1)).real
    return np.ascontiguousarray(res, dtype=np.float32)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/neuraloperator_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--fine", type=int, default=256)
    p.add_argument("--n-states", type=int, default=64)
    p.add_argument("--t-start", type=int, default=10,
                   help="earliest snapshot index to draw states from "
                        "(on-attractor)")
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--visc", type=float, default=1e-3)
    p.add_argument("--raw", type=str, default=None,
                   help="raw trajectory .npy (default: the held-out test "
                        "trajectories)")
    args = p.parse_args()

    from neuraloperator_tpu.data.datasets.ns_solver import (
        simulate_navier_stokes_2d,
    )

    raw_path = args.raw or (
        Path(__file__).resolve().parents[1]
        / "neuraloperator_tpu/data/datasets/data/ns_raw"
        / f"nsforcing_traj_test_{args.res}.npy"
    )
    traj = np.load(raw_path, mmap_mode="r")  # (n_traj, n_snap, res, res)
    n_traj, n_snap = traj.shape[:2]
    rng = np.random.default_rng(0)
    ti = rng.integers(0, n_traj, size=args.n_states)
    si = rng.integers(args.t_start, n_snap - 1, size=args.n_states)
    w_t = np.asarray(traj[ti, si], dtype=np.float32)  # (N, res, res)

    # (a) coarse step — exactly the label path of the training data
    w1_coarse = np.asarray(
        simulate_navier_stokes_2d(
            w_t, visc=args.visc, T=1.0, dt=args.dt, record_dt=1.0
        )
    )[:, 0]

    # (b) fine step at 2x, truncated back
    w_t_fine = spectral_resample(w_t, args.fine)
    w1_fine = np.asarray(
        simulate_navier_stokes_2d(
            w_t_fine, visc=args.visc, T=1.0, dt=args.dt, record_dt=1.0
        )
    )[:, 0]
    w1_ref = spectral_resample(w1_fine, args.res)

    num = np.linalg.norm(
        (w1_coarse - w1_ref).reshape(args.n_states, -1), axis=1
    )
    den = np.linalg.norm(w1_ref.reshape(args.n_states, -1), axis=1)
    rel = num / den
    out = {
        "metric": "ns_solver_label_rel_l2_vs_2x",
        "res": args.res,
        "fine": args.fine,
        "n_states": args.n_states,
        "mean": float(rel.mean()),
        "median": float(np.median(rel)),
        "p95": float(np.percentile(rel, 95)),
        "max": float(rel.max()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
