"""Nonlinear Poisson point-cloud dataset (for GINO + physics losses).

Equivalent of reference ``neuralop/data/datasets/nonlinear_poisson.py``:
dict samples with input geometry, boundary/interior query points, source
terms and solution values. Loads a compatible ``.pt`` archive if provided;
otherwise generates synthetic samples by solving a Poisson problem on a
grid (in-package FD solver) and sampling point clouds from it.
"""

from pathlib import Path
from typing import List, Optional

import numpy as np

from .tensor_dataset import DictDataset


def _generate_sample(rng: np.random.Generator, grid_n: int = 32,
                     n_interior: int = 256, n_boundary: int = 64):
    from scipy.sparse import lil_matrix
    from scipy.sparse.linalg import spsolve

    from .synthetic import gaussian_random_field

    f_grid = gaussian_random_field(rng, grid_n, alpha=3.0, tau=5.0) * 10

    # solve -Δu = f with u=0 on the boundary (linear proxy of the
    # reference's nonlinear problem; used for pipeline/smoke paths)
    n = grid_n
    h = 1.0 / (n + 1)
    A = lil_matrix((n * n, n * n))
    b = f_grid.reshape(-1) * h ** 2

    def idx(i, j):
        return i * n + j

    for i in range(n):
        for j in range(n):
            A[idx(i, j), idx(i, j)] = 4.0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    A[idx(i, j), idx(ii, jj)] = -1.0
    u = spsolve(A.tocsr(), b).reshape(n, n)

    xs = (np.arange(n) + 1) * h

    def interp(pts):
        i = np.clip((pts[:, 0] / h - 1).astype(int), 0, n - 1)
        j = np.clip((pts[:, 1] / h - 1).astype(int), 0, n - 1)
        return u[i, j]

    def interp_f(pts):
        i = np.clip((pts[:, 0] / h - 1).astype(int), 0, n - 1)
        j = np.clip((pts[:, 1] / h - 1).astype(int), 0, n - 1)
        return f_grid[i, j]

    interior = rng.uniform(h, 1 - h, size=(n_interior, 2))
    t = rng.uniform(0, 1, n_boundary)
    side = rng.integers(0, 4, n_boundary)
    boundary = np.zeros((n_boundary, 2))
    boundary[side == 0] = np.stack(
        [t[side == 0], np.zeros((side == 0).sum())], -1
    )
    boundary[side == 1] = np.stack(
        [t[side == 1], np.ones((side == 1).sum())], -1
    )
    boundary[side == 2] = np.stack(
        [np.zeros((side == 2).sum()), t[side == 2]], -1
    )
    boundary[side == 3] = np.stack(
        [np.ones((side == 3).sum()), t[side == 3]], -1
    )

    queries = np.concatenate([boundary, interior], 0).astype(np.float32)
    vals = np.concatenate(
        [np.zeros(n_boundary), interp(interior)], 0
    ).astype(np.float32)
    return {
        "input_geom": queries,
        "output_queries": queries,
        "y": vals[:, None],
        "x": interp_f(queries).astype(np.float32)[:, None],
        "num_boundary": np.int64(n_boundary),
        "output_source_terms_domain": interp_f(interior).astype(np.float32),
    }


class NonlinearPoissonDataset:
    """Point-cloud Poisson dataset (reference nonlinear_poisson.py:118+)."""

    def __init__(
        self,
        file_path: Optional[str] = None,
        n_train: int = 8,
        n_test: int = 2,
        seed: int = 0,
        **kwargs,
    ):
        if file_path is not None and Path(file_path).exists():
            import torch

            raw = torch.load(str(file_path), weights_only=False)
            data = [
                {
                    k: (v.detach().cpu().numpy() if hasattr(v, "numpy") else v)
                    for k, v in entry.items()
                }
                for entry in raw
            ]
        else:
            rng = np.random.default_rng(seed)
            data = [_generate_sample(rng) for _ in range(n_train + n_test)]
        self.train_data = DictDataset(data[:n_train])
        self.test_data = DictDataset(data[n_train : n_train + n_test])
