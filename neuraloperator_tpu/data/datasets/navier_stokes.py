"""Navier-Stokes (2-D vorticity) dataset.

Equivalent of reference ``neuralop/data/datasets/navier_stokes.py``
(``load_navier_stokes_pt``). The full dataset comes from Zenodo in the
reference; here the loader reads ``nsforcing_{split}_{res}.pt`` files when
present, and otherwise *generates* data with the in-package pseudo-spectral
2-D Navier-Stokes solver below (Crank-Nicolson in the viscous term, RK-ish
explicit nonlinear term — the standard FNO data-generation scheme).
"""

from pathlib import Path
from typing import List, Optional

import numpy as np

from .pt_dataset import PTDataset
from .tensor_dataset import DataLoader


def solve_navier_stokes_2d(
    w0: np.ndarray,
    visc: float = 1e-3,
    T: float = 1.0,
    delta_t: float = 1e-3,
    record_steps: int = 1,
    forcing_amp: float = 0.1,
):
    """Evolve 2-D incompressible NS in vorticity form on the torus.

    Pseudo-spectral; returns the vorticity at the final time (or a time
    series). Same formulation as the reference's data-generation examples.
    """
    n = w0.shape[-1]
    k = np.fft.fftfreq(n, d=1.0 / n)
    kx, ky = np.meshgrid(k, k, indexing="ij")
    lap = -(4 * np.pi ** 2) * (kx ** 2 + ky ** 2)
    lap_inv = np.where(lap == 0, 1.0, lap)

    xs = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    forcing = forcing_amp * (
        np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y))
    )
    f_h = np.fft.fft2(forcing)

    w_h = np.fft.fft2(w0)
    steps = int(T / delta_t)
    out = []
    record_every = max(steps // max(record_steps, 1), 1)
    for s in range(steps):
        psi_h = w_h / lap_inv
        u = np.real(np.fft.ifft2(2j * np.pi * ky * psi_h))
        v = np.real(np.fft.ifft2(-2j * np.pi * kx * psi_h))
        w_x = np.real(np.fft.ifft2(2j * np.pi * kx * w_h))
        w_y = np.real(np.fft.ifft2(2j * np.pi * ky * w_h))
        nonlinear_h = np.fft.fft2(u * w_x + v * w_y)
        # Crank-Nicolson for viscosity, explicit advection + forcing
        w_h = (
            w_h * (1 + 0.5 * delta_t * visc * lap)
            - delta_t * nonlinear_h
            + delta_t * f_h
        ) / (1 - 0.5 * delta_t * visc * lap)
        if (s + 1) % record_every == 0:
            out.append(np.real(np.fft.ifft2(w_h)))
    return np.stack(out) if record_steps > 1 else np.real(np.fft.ifft2(w_h))


def generate_navier_stokes_files(
    root, n_train=64, n_test=16, res=64, visc=1e-3, T=1.0, seed=0
):
    """Write nsforcing_{train,test}_{res}.pt files (vorticity -> vorticity)."""
    import torch

    from .synthetic import gaussian_random_field

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    def make(n_samples):
        xs = np.empty((n_samples, res, res), dtype=np.float32)
        ys = np.empty((n_samples, res, res), dtype=np.float32)
        for i in range(n_samples):
            w0 = gaussian_random_field(rng, res, alpha=2.5, tau=7.0) * 5
            xs[i] = w0.astype(np.float32)
            ys[i] = solve_navier_stokes_2d(
                w0, visc=visc, T=T, delta_t=5e-4 if res <= 64 else 2.5e-4
            ).astype(np.float32)
        return xs, ys

    for split, n_samples in (("train", n_train), ("test", n_test)):
        if n_samples <= 0:
            # don't write an empty file: its existence would suppress a
            # proper regeneration later
            continue
        x, y = make(n_samples)
        torch.save(
            {"x": torch.tensor(x), "y": torch.tensor(y)},
            (root / f"nsforcing_{split}_{res}.pt").as_posix(),
        )


def load_navier_stokes_pt(
    n_train: int,
    n_tests: List[int],
    batch_size: int,
    test_batch_sizes: List[int],
    data_root: Optional[str] = None,
    train_resolution: int = 64,
    test_resolutions: List[int] = (64,),
    encode_input: bool = True,
    encode_output: bool = True,
    seed: int = 0,
    **kwargs,
):
    """Reference ``load_navier_stokes_pt`` (navier_stokes.py:142).

    Returns (train_loader, test_loaders, data_processor).
    """
    root = Path(data_root) if data_root else Path(__file__).parent / "data"
    if not (root / f"nsforcing_train_{train_resolution}.pt").exists():
        generate_navier_stokes_files(
            root,
            n_train=max(n_train, 32),
            n_test=max(max(n_tests), 8),
            res=train_resolution,
        )
    # test files at OTHER resolutions (zero-shot super-resolution eval)
    # are generated on demand too — train samples are skipped for those
    for res, n_t in zip(test_resolutions, n_tests):
        if not (root / f"nsforcing_test_{res}.pt").exists():
            generate_navier_stokes_files(
                root, n_train=0, n_test=max(n_t, 4), res=res
            )
    ds = PTDataset(
        root_dir=root,
        dataset_name="nsforcing",
        n_train=n_train,
        n_tests=n_tests,
        batch_size=batch_size,
        test_batch_sizes=test_batch_sizes,
        train_resolution=train_resolution,
        test_resolutions=list(test_resolutions),
        encode_input=encode_input,
        encode_output=encode_output,
        **kwargs,
    )
    train_loader = DataLoader(ds.train_db, batch_size, shuffle=True, seed=seed)
    test_loaders = {
        res: DataLoader(db, bs)
        for (res, db), bs in zip(ds.test_dbs.items(), test_batch_sizes)
    }
    return train_loader, test_loaders, ds.data_processor


class NavierStokesDataset(PTDataset):
    """Named PTDataset over nsforcing_{train,test}_{res}.pt files
    (reference navier_stokes.py:15-141). Files are generated on the fly
    from the spectral solver when absent (zero-egress environment)."""

    def __init__(
        self,
        root_dir,
        n_train: int,
        n_tests: List[int],
        batch_size: int,
        test_batch_sizes: List[int],
        train_resolution: int = 128,
        test_resolutions: List[int] = (128,),
        encode_input: bool = True,
        encode_output: bool = True,
        encoding: str = "channel-wise",
        channel_dim: int = 1,
        **kwargs,
    ):
        root = Path(root_dir)
        missing = [
            res
            for res in set([train_resolution, *test_resolutions])
            if not (root / f"nsforcing_train_{res}.pt").exists()
            or not (root / f"nsforcing_test_{res}.pt").exists()
        ]
        for res in missing:
            generate_navier_stokes_files(
                root,
                n_train=max(n_train, 32),
                n_test=max(max(n_tests), 8),
                res=res,
            )
        super().__init__(
            root_dir=root,
            dataset_name="nsforcing",
            n_train=n_train,
            n_tests=n_tests,
            batch_size=batch_size,
            test_batch_sizes=test_batch_sizes,
            train_resolution=train_resolution,
            test_resolutions=list(test_resolutions),
            encode_input=encode_input,
            encode_output=encode_output,
            encoding=encoding,
            channel_dim=channel_dim,
            **kwargs,
        )
