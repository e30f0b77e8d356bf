"""Spherical shallow-water equations dataset (for SFNO).

Equivalent of reference ``neuralop/data/datasets/spherical_swe.py`` (which
wraps torch_harmonics' ShallowWaterSolver): on-the-fly random initial
conditions evolved with an in-package spectral SWE step built on our SHT
(``ops/sht``). The dataset yields (u(t0), u(t1)) pairs of the 3-channel
state (geopotential, vorticity, divergence style variables).
"""

from typing import Iterator, Tuple

import numpy as np

from ...ops.sht import isht, sht


def _host_cpu():
    """CPU device for eager spectral data generation.

    The solver manipulates complex SHT coefficients EAGERLY; restricted
    TPU runtimes cannot transfer complex arrays host-side, so generation
    pins to the CPU backend when one is available.
    """
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


class SphericalSWESolver:
    """Coarse spectral dynamics on the sphere.

    A simplified shallow-water-like evolution: the state is advanced in
    spectral space with rotation-dependent phase speeds and mild diffusion —
    sufficient to produce physically-structured, band-limited dynamics for
    SFNO training/benchmarks without external dependencies.
    """

    def __init__(self, nlat: int = 32, nlon: int = 64, lmax: int = None,
                 diffusion: float = 1e-4, rotation: float = 1.0):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = lmax or nlat // 2
        self.diffusion = diffusion
        self.rotation = rotation

    def random_state(self, rng: np.random.Generator) -> np.ndarray:
        """Random smooth 3-channel field on the sphere."""
        import contextlib

        import jax
        import jax.numpy as jnp

        dev = _host_cpu()
        ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
        with ctx:
            return self._random_state(rng, jnp)

    def _random_state(self, rng, jnp) -> np.ndarray:
        lmax = self.lmax
        coeffs = rng.standard_normal((3, lmax, lmax)) + 1j * rng.standard_normal(
            (3, lmax, lmax)
        )
        l = np.arange(lmax)[:, None]
        decay = (1.0 + l) ** -2.5
        coeffs = coeffs * decay
        tri = np.tril(np.ones((lmax, lmax)))  # m <= l
        coeffs = coeffs * tri
        field = isht(
            jnp.asarray(coeffs, jnp.complex64), nlat=self.nlat, nlon=self.nlon,
            grid="equiangular",
        )
        return np.asarray(field, np.float32)

    def step(self, state: np.ndarray, dt: float = 0.1, n_steps: int = 10):
        """Advance the state: per-degree rotation phases + diffusion."""
        import contextlib

        import jax
        import jax.numpy as jnp

        dev = _host_cpu()
        ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
        with ctx:
            return self._step(state, dt, n_steps, jnp)

    def _step(self, state, dt, n_steps, jnp):
        flm = sht(
            jnp.asarray(state), lmax=self.lmax, mmax=self.lmax,
            grid="equiangular",
        )
        flm = np.asarray(flm)
        l = np.arange(self.lmax)[:, None]
        m = np.arange(self.lmax)[None, :]
        # Rossby-Haurwitz-like dispersion: omega = -2 Omega m / (l (l + 1))
        ll = np.where(l == 0, 1, l * (l + 1))
        omega = -2.0 * self.rotation * m / ll
        damp = np.exp(-self.diffusion * (l * (l + 1)) * dt * n_steps)
        phase = np.exp(1j * omega * dt * n_steps)
        flm = flm * (phase * damp)[None]
        out = isht(
            jnp.asarray(flm, np.complex64), nlat=self.nlat, nlon=self.nlon,
            grid="equiangular",
        )
        return np.asarray(out, np.float32)


def load_spherical_swe(
    n_train: int = 32,
    n_test: int = 8,
    batch_size: int = 4,
    test_batch_sizes=(4,),
    train_resolution: Tuple[int, int] = (32, 64),
    test_resolutions=((32, 64),),
    seed: int = 0,
):
    """On-the-fly SWE dataset (reference spherical_swe.py:1-60 style).

    Returns (train_loader, test_loaders, data_processor=None); batches are
    {'x': (b, 3, nlat, nlon), 'y': same} pairs.
    """
    from .tensor_dataset import DataLoader, TensorDataset

    rng = np.random.default_rng(seed)

    def make(n, res):
        solver = SphericalSWESolver(nlat=res[0], nlon=res[1])
        xs, ys = [], []
        for _ in range(n):
            x0 = solver.random_state(rng)
            xs.append(x0)
            ys.append(solver.step(x0))
        return TensorDataset(np.stack(xs), np.stack(ys))

    train_loader = DataLoader(
        make(n_train, train_resolution), batch_size, shuffle=True, seed=seed
    )
    test_loaders = {
        tuple(res): DataLoader(make(n_test, res), bs)
        for res, bs in zip(test_resolutions, test_batch_sizes)
    }
    return train_loader, test_loaders, None


class SphericalSWEDataset:
    """Map-style on-the-fly SWE dataset (reference spherical_swe.py:48-130).

    Each item is a dict ``{'x': (3, nlat, nlon), 'y': same}``: a random
    initial state and the solver-advanced state ``dt`` seconds later.
    Samples are generated lazily per index with a deterministic per-item
    seed, matching the reference's resolution-scaled solver stepping.
    """

    def __init__(
        self,
        dt: float = 3600,
        dims: Tuple[int, int] = (32, 64),
        initial_condition: str = "random",
        num_examples: int = 32,
        normalize: bool = True,
        seed: int = 0,
    ):
        if initial_condition != "random":
            raise ValueError(
                f"initial_condition must be 'random' (got "
                f"{initial_condition!r}); Galewsky-style ICs are not "
                "implemented in this build"
            )
        # heuristic from the reference: finer grids need smaller solver dt
        dt_min = 256 / dims[0] * 150
        self.nsteps = max(int(dt // dt_min), 1)
        self.num_examples = num_examples
        self.normalize = normalize
        self.initial_condition = initial_condition
        self.seed = seed
        self.solver = SphericalSWESolver(nlat=dims[0], nlon=dims[1])

    def __len__(self) -> int:
        return self.num_examples

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + index)
        x = self.solver.random_state(rng)
        y = self.solver.step(x, n_steps=self.nsteps)
        if self.normalize:
            mean = x.mean(axis=(-2, -1), keepdims=True)
            std = x.std(axis=(-2, -1), keepdims=True) + 1e-8
            x = (x - mean) / std
            y = (y - mean) / std
        return {"x": x.astype(np.float32), "y": y.astype(np.float32)}
