"""Spherical harmonic transforms (SHT) on TPU.

Replacement for the reference's ``torch_harmonics`` dependency
(``/root/reference/neuralop/layers/spherical_convolution.py:206-281``):
real SHT = rfft in longitude + an associated-Legendre matmul in latitude.
The Legendre matrices are precomputed on the host (float64 numpy, stable
normalized recurrences) and cached by (nlat, lmax, mmax, grid); the runtime
cost is a single large real matmul per direction — exactly what the MXU
wants.

Conventions: orthonormal spherical harmonics Y_lm = Pbar_l^m(cos θ) e^{imφ}
with Condon-Shortley phase; coefficients f_lm = ∫ f Y_lm* dΩ for m >= 0
(real fields ⇒ negative m implied by conjugate symmetry).

Grids: 'legendre-gauss' (exact quadrature) and 'equiangular' (cell-centered
colatitudes with Fejér-1 weights).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalized_legendre(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Pbar[l, m, j] at x_j = cos(theta_j), orthonormal normalization.

    2π ∫ Pbar_l^m(x)^2 dx = 1 (so Y_lm are orthonormal on the sphere).
    Standard stable recurrence over l for each m.
    """
    nlat = x.shape[0]
    P = np.zeros((lmax, mmax, nlat))
    sx = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    # seed: Pbar_0^0 = sqrt(1/4π)
    pmm = np.full(nlat, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(mmax):
        if m > 0:
            pmm = -np.sqrt((2 * m + 1.0) / (2.0 * m)) * sx * pmm
        if m < lmax:
            P[m, m] = pmm
        if m + 1 < lmax:
            P[m + 1, m] = np.sqrt(2.0 * m + 3.0) * x * pmm
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(
                ((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0)
            )
            P[l, m] = a * (x * P[l - 1, m] - b * P[l - 2, m])
    return P


def _quadrature(nlat: int, grid: str) -> Tuple[np.ndarray, np.ndarray]:
    """Colatitude cosines x_j and weights w_j with Σ w_j f(x_j) ≈ ∫_{-1}^1 f."""
    if grid == "legendre-gauss":
        x, w = np.polynomial.legendre.leggauss(nlat)
        # descending colatitude order (theta from 0 to pi -> x from 1 to -1)
        return x[::-1].copy(), w[::-1].copy()
    if grid == "equiangular":
        # cell-centered theta_j = pi (j + 1/2) / nlat, Fejér-1 weights in theta
        theta = np.pi * (np.arange(nlat) + 0.5) / nlat
        x = np.cos(theta)
        k = np.arange(1, nlat // 2 + 1)
        w = np.zeros(nlat)
        for j in range(nlat):
            w[j] = (2.0 / nlat) * (
                1.0
                - 2.0
                * np.sum(np.cos(2.0 * k * theta[j]) / (4.0 * k ** 2 - 1.0))
            )
        # Fejér weights integrate f(x) dx via sin factor folded in
        return x, w
    raise ValueError(f"unknown grid {grid!r}; use 'equiangular' or 'legendre-gauss'")


@functools.lru_cache(maxsize=32)
def _sht_matrices_np(nlat: int, lmax: int, mmax: int, grid: str):
    """(analysis[l,m,j] incl. weights & 2π, synthesis[j,l,m]) as float32.

    Cached as NUMPY arrays: caching jnp arrays would capture tracers when
    the first call happens inside a jit trace (the array created under
    one trace leaks into the next — UnexpectedTracerError).
    """
    x, w = _quadrature(nlat, grid)
    P = _normalized_legendre(lmax, mmax, x)  # (l, m, j)
    analysis = 2.0 * np.pi * P * w[None, None, :]
    synthesis = np.transpose(P, (2, 0, 1))  # (j, l, m)
    return (
        np.asarray(analysis, np.float32),
        np.asarray(synthesis, np.float32),
    )


def _sht_matrices(nlat: int, lmax: int, mmax: int, grid: str):
    a, s = _sht_matrices_np(nlat, lmax, mmax, grid)
    return jnp.asarray(a), jnp.asarray(s)


def sht(
    x: jnp.ndarray,
    lmax: int,
    mmax: int,
    grid: str = "equiangular",
    norm: str = "ortho",
) -> jnp.ndarray:
    """Real SHT: (..., nlat, nlon) real -> (..., lmax, mmax) complex.

    norm='ortho' only (the reference uses ortho throughout).
    """
    assert norm == "ortho"
    from .fourier import rdft_gather_last

    nlat = x.shape[-2]
    nlon = x.shape[-1]
    analysis, _ = _sht_matrices(nlat, lmax, mmax, grid)
    # longitude transform as a truncated real-DFT matmul: only mmax of the
    # nlon//2+1 rfft bins are kept, so the (mmax x nlon) matmul beats the
    # FFT and keeps the whole SHT complex-op-free (same trick as the
    # spectral conv's truncated-DFT path, ops/fourier.py)
    m_avail = min(mmax, nlon // 2 + 1)
    Fr, Fi = rdft_gather_last(x, m_avail, "forward")
    if m_avail < mmax:
        pad = [(0, 0)] * Fr.ndim
        pad[-1] = (0, mmax - m_avail)
        Fr, Fi = jnp.pad(Fr, pad), jnp.pad(Fi, pad)
    # per-m Legendre matmul; split-real x real matrix
    Ar = analysis  # (l, m, j)
    fr = jnp.einsum("lmj,...jm->...lm", Ar, Fr)
    fi = jnp.einsum("lmj,...jm->...lm", Ar, Fi)
    return jax.lax.complex(fr, fi)


def isht(
    flm: jnp.ndarray,
    nlat: int,
    nlon: int,
    grid: str = "equiangular",
    norm: str = "ortho",
) -> jnp.ndarray:
    """Inverse real SHT: (..., lmax, mmax) complex -> (..., nlat, nlon) real."""
    assert norm == "ortho"
    from .fourier import rdft_scatter_last

    _, synthesis = _sht_matrices(nlat, flm.shape[-2], flm.shape[-1], grid)
    Gr = jnp.einsum("jlm,...lm->...jm", synthesis, jnp.real(flm))
    Gi = jnp.einsum("jlm,...lm->...jm", synthesis, jnp.imag(flm))
    half = nlon // 2 + 1
    m = Gr.shape[-1]
    if m > half:
        idx = [slice(None)] * Gr.ndim
        idx[-1] = slice(0, half)
        Gr, Gi = Gr[tuple(idx)], Gi[tuple(idx)]
    # truncated inverse real-DFT matmul == pad-to-half + irfft (irfft
    # ignores the DC/Nyquist imaginary parts, which the matrix encodes
    # structurally)
    return rdft_scatter_last(Gr, Gi, nlon, "forward")
