"""Finite-difference and spectral differentiation.

Equivalent of reference ``neuralop/losses/differentiation.py``: the
``FiniteDiff`` class (2nd-order central interiors, 3rd-order one-sided
boundaries or periodic roll), free central-difference helpers, and
``FourierDiff`` spectral differentiation.

All ops are static-shape and expressed with rolls/concats that XLA fuses.
"""

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def _central(u, h, axis, order):
    up = jnp.roll(u, -1, axis)
    um = jnp.roll(u, 1, axis)
    if order == 1:
        return (up - um) / (2 * h)
    return (up - 2 * u + um) / (h * h)


def _take(u, axis, idx):
    sl = [slice(None)] * u.ndim
    sl[axis] = idx
    return u[tuple(sl)]


def _diff_axis(u: jnp.ndarray, h: float, axis: int, order: int, periodic: bool):
    """Finite difference along ``axis``.

    Interior: 2nd-order central. Non-periodic boundaries use the reference's
    3rd-order one-sided stencils (differentiation.py:61-71).
    """
    d = _central(u, h, axis, order)
    if periodic:
        return d
    f = lambda i: _take(u, axis, slice(i, i + 1))  # noqa: E731
    n = u.shape[axis]
    g = lambda i: _take(u, axis, slice(n + i, n + i + 1 if i != -1 else None))  # noqa: E731
    if order == 1:
        left = (-11 * f(0) + 18 * f(1) - 9 * f(2) + 2 * f(3)) / (6 * h)
        right = (-2 * g(-4) + 9 * g(-3) - 18 * g(-2) + 11 * g(-1)) / (6 * h)
    elif order == 2:
        left = (2 * f(0) - 5 * f(1) + 4 * f(2) - f(3)) / (h * h)
        right = (-g(-4) + 4 * g(-3) - 5 * g(-2) + 2 * g(-1)) / (h * h)
    else:
        raise ValueError("order must be 1 or 2")
    mid = _take(d, axis, slice(1, -1))
    return jnp.concatenate([left, mid, right], axis=axis)


class FiniteDiff:
    """Unified 1/2/3-D finite differences (reference FiniteDiff, :11-660).

    ``dx`` differentiates along the first spatial axis (axis ``-dim``),
    ``dy`` along ``-dim+1``, ``dz`` along ``-1``.
    """

    def __init__(
        self,
        dim: int,
        h: Union[float, Sequence[float]] = 1.0,
        periodic_in_x: bool = True,
        periodic_in_y: bool = True,
        periodic_in_z: bool = True,
    ):
        if dim not in (1, 2, 3):
            raise ValueError("dim must be 1, 2, or 3")
        self.dim = dim
        if isinstance(h, (int, float)):
            self.h = tuple(float(h) for _ in range(dim))
        else:
            if len(h) != dim:
                raise ValueError(f"h must be a float or length-{dim} sequence")
            self.h = tuple(float(v) for v in h)
        self.periodic = (periodic_in_x, periodic_in_y, periodic_in_z)[:dim]

    def _axis(self, i: int) -> int:
        return -self.dim + i

    def dx(self, u, order: int = 1):
        return _diff_axis(u, self.h[0], self._axis(0), order, self.periodic[0])

    def dy(self, u, order: int = 1):
        if self.dim < 2:
            raise ValueError("dy is only available for 2D and 3D")
        return _diff_axis(u, self.h[1], self._axis(1), order, self.periodic[1])

    def dz(self, u, order: int = 1):
        if self.dim < 3:
            raise ValueError("dz is only available for 3D")
        return _diff_axis(u, self.h[2], self._axis(2), order, self.periodic[2])

    def laplacian(self, u):
        out = self.dx(u, 2)
        if self.dim >= 2:
            out = out + self.dy(u, 2)
        if self.dim >= 3:
            out = out + self.dz(u, 2)
        return out

    def gradient(self, u):
        parts = [self.dx(u)]
        if self.dim >= 2:
            parts.append(self.dy(u))
        if self.dim >= 3:
            parts.append(self.dz(u))
        if self.dim == 1:
            return parts[0]
        return jnp.stack(parts, axis=-self.dim - 1)

    def divergence(self, v):
        """v: vector field with components stacked on axis ``-dim-1``."""
        comps = [_take(v, -self.dim - 1, i) for i in range(self.dim)]
        out = _diff_axis(comps[0], self.h[0], self._axis(0), 1, self.periodic[0])
        if self.dim >= 2:
            out = out + _diff_axis(
                comps[1], self.h[1], self._axis(1), 1, self.periodic[1]
            )
        if self.dim >= 3:
            out = out + _diff_axis(
                comps[2], self.h[2], self._axis(2), 1, self.periodic[2]
            )
        return out

    def curl(self, v):
        if self.dim == 2:
            vx = _take(v, -3, 0)
            vy = _take(v, -3, 1)
            return (
                _diff_axis(vy, self.h[0], -2, 1, self.periodic[0])
                - _diff_axis(vx, self.h[1], -1, 1, self.periodic[1])
            )
        if self.dim == 3:
            vx, vy, vz = (_take(v, -4, i) for i in range(3))
            dy = lambda u: _diff_axis(u, self.h[1], -2, 1, self.periodic[1])  # noqa: E731
            dz = lambda u: _diff_axis(u, self.h[2], -1, 1, self.periodic[2])  # noqa: E731
            dx = lambda u: _diff_axis(u, self.h[0], -3, 1, self.periodic[0])  # noqa: E731
            return jnp.stack(
                [dy(vz) - dz(vy), dz(vx) - dx(vz), dx(vy) - dy(vx)], axis=-4
            )
        raise ValueError("curl requires dim 2 or 3")


def central_diff_1d(x, h, fix_x_bnd=False):
    """2nd-order central difference along the last dim (reference :663-680)."""
    dx = (jnp.roll(x, -1, -1) - jnp.roll(x, 1, -1)) / (2 * h)
    if fix_x_bnd:
        left = (_take(x, -1, slice(1, 2)) - _take(x, -1, slice(0, 1))) / h
        right = (_take(x, -1, slice(-1, None)) - _take(x, -1, slice(-2, -1))) / h
        dx = jnp.concatenate([left, _take(dx, -1, slice(1, -1)), right], axis=-1)
    return dx


def central_diff_2d(x, h, fix_x_bnd=False, fix_y_bnd=False):
    if isinstance(h, (int, float)):
        h = (h, h)
    dx = (jnp.roll(x, -1, -2) - jnp.roll(x, 1, -2)) / (2 * h[0])
    dy = (jnp.roll(x, -1, -1) - jnp.roll(x, 1, -1)) / (2 * h[1])
    if fix_x_bnd:
        left = (_take(x, -2, slice(1, 2)) - _take(x, -2, slice(0, 1))) / h[0]
        right = (_take(x, -2, slice(-1, None)) - _take(x, -2, slice(-2, -1))) / h[0]
        dx = jnp.concatenate([left, _take(dx, -2, slice(1, -1)), right], axis=-2)
    if fix_y_bnd:
        lo = (_take(x, -1, slice(1, 2)) - _take(x, -1, slice(0, 1))) / h[1]
        hi = (_take(x, -1, slice(-1, None)) - _take(x, -1, slice(-2, -1))) / h[1]
        dy = jnp.concatenate([lo, _take(dy, -1, slice(1, -1)), hi], axis=-1)
    return dx, dy


def central_diff_3d(x, h, fix_x_bnd=False, fix_y_bnd=False, fix_z_bnd=False):
    if isinstance(h, (int, float)):
        h = (h, h, h)
    dx = (jnp.roll(x, -1, -3) - jnp.roll(x, 1, -3)) / (2 * h[0])
    dy = (jnp.roll(x, -1, -2) - jnp.roll(x, 1, -2)) / (2 * h[1])
    dz = (jnp.roll(x, -1, -1) - jnp.roll(x, 1, -1)) / (2 * h[2])
    for fix, ax, hh, arr_name in (
        (fix_x_bnd, -3, h[0], "dx"),
        (fix_y_bnd, -2, h[1], "dy"),
        (fix_z_bnd, -1, h[2], "dz"),
    ):
        if fix:
            arr = {"dx": dx, "dy": dy, "dz": dz}[arr_name]
            left = (_take(x, ax, slice(1, 2)) - _take(x, ax, slice(0, 1))) / hh
            right = (
                _take(x, ax, slice(-1, None)) - _take(x, ax, slice(-2, -1))
            ) / hh
            arr = jnp.concatenate(
                [left, _take(arr, ax, slice(1, -1)), right], axis=ax
            )
            if arr_name == "dx":
                dx = arr
            elif arr_name == "dy":
                dy = arr
            else:
                dz = arr
    return dx, dy, dz


class FourierDiff:
    """Spectral differentiation along the last dim(s).

    Subset of reference ``FourierDiff`` (differentiation.py:858-1360): exact
    derivatives of periodic signals via multiplication by (ik)^n in Fourier
    space; ``L`` is the domain length.
    """

    def __init__(self, dim: int = 1, L: Union[float, Sequence[float]] = 2 * jnp.pi,
                 use_fc: bool = False, fc_degree: int = 4,
                 fc_n_additional_pts: int = 50, low_pass_filter_ratio=None):
        self.dim = dim
        if isinstance(L, (int, float)):
            L = [float(L)] * dim
        self.L = list(L)
        self.use_fc = use_fc
        self.low_pass_filter_ratio = low_pass_filter_ratio
        if use_fc:
            from ..layers.fourier_continuation import FCLegendre

            self.fc = FCLegendre(d=fc_degree, n_additional_pts=fc_n_additional_pts)
        else:
            self.fc = None

    def _k(self, n: int, L: float):
        return 2 * jnp.pi * jnp.fft.fftfreq(n, d=1.0 / n) / L

    def _d_axis(self, u, order: int, axis: int, L: float):
        if self.fc is not None:
            # extend the non-periodic signal to a smooth periodic one, take
            # the spectral derivative there, and restrict back
            # (reference FourierDiff FC route, differentiation.py:858-1360)
            n_orig = u.shape[axis]
            u = self.fc.extend(u, dim=(axis,))
            L = L * u.shape[axis] / n_orig
        n = u.shape[axis]
        k = self._k(n, L)
        if self.low_pass_filter_ratio is not None:
            cutoff = self.low_pass_filter_ratio * jnp.max(jnp.abs(k))
            filt = (jnp.abs(k) <= cutoff).astype(u.dtype)
            k = k * filt
        shape = [1] * u.ndim
        shape[axis] = n
        uh = jnp.fft.fft(u, axis=axis)
        duh = ((1j * k.reshape(shape)) ** order) * uh
        out = jnp.real(jnp.fft.ifft(duh, axis=axis))
        if self.fc is not None:
            out = self.fc.restrict(out, dim=(axis,))
        return out

    def dx(self, u, order: int = 1):
        return self._d_axis(u, order, -self.dim, self.L[0])

    def dy(self, u, order: int = 1):
        if self.dim < 2:
            raise ValueError("dy requires dim >= 2")
        return self._d_axis(u, order, -self.dim + 1, self.L[1])

    def dz(self, u, order: int = 1):
        if self.dim < 3:
            raise ValueError("dz requires dim >= 3")
        return self._d_axis(u, order, -1, self.L[2])

    def laplacian(self, u):
        out = self.dx(u, 2)
        if self.dim >= 2:
            out = out + self.dy(u, 2)
        if self.dim >= 3:
            out = out + self.dz(u, 2)
        return out


def get_non_uniform_fd_weights(
    points, num_neighbors=5, derivative_indices=(0,), radius=None,
    regularize_lstsq=False,
):
    """Least-squares FD stencils on unstructured point clouds.

    Mirrors reference ``get_non_uniform_fd_weights``
    (differentiation.py:728-815): for each point, fit first-order-consistent
    weights over its k nearest neighbors. Returns (indices (N, k),
    weights (N, n_derivs, k)).
    """
    points = jnp.asarray(points)
    N, d = points.shape
    k = min(max(num_neighbors, 3), N)

    d2 = jnp.sum(
        (points[:, None, :] - points[None, :, :]) ** 2, axis=-1
    )
    neg_d2, indices = jax.lax.top_k(-d2, k)
    distances = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))

    if radius is None:
        mask = jnp.ones_like(distances, dtype=bool)
    else:
        mask = distances <= radius
        mask = mask.at[:, :3].set(True)

    # A: (N, d+1, k) — consistency conditions [sum w = 0-th; sum w dx = e_j]
    rows = [jnp.ones((N, k), points.dtype)]
    for i in range(d):
        rows.append(points[indices, i] - points[:, i][:, None])
    A = jnp.stack(rows, axis=1)
    A = A * mask[:, None, :]
    A = jnp.broadcast_to(
        A[:, None], (N, len(derivative_indices)) + A.shape[1:]
    )

    b = jnp.zeros((len(derivative_indices), d + 1, 1), points.dtype)
    for j, di in enumerate(derivative_indices):
        b = b.at[j, di + 1, 0].set(1.0)
    b = jnp.broadcast_to(b[None], (N,) + b.shape)

    if regularize_lstsq:
        lam = 1e-6
        AT = jnp.swapaxes(A, -2, -1)
        AtA = AT @ A + lam * jnp.eye(k, dtype=A.dtype)
        Atb = AT @ b
        w = jnp.linalg.solve(AtA, Atb)[..., 0]
    else:
        # batched least squares via pinv (jnp.linalg.lstsq is not batched)
        w = (jnp.linalg.pinv(A) @ b)[..., 0]
    return indices, w


def non_uniform_fd(
    points, values, num_neighbors=5, derivative_indices=(0,), radius=None,
    regularize_lstsq=False,
):
    """First-order derivatives on unstructured point clouds
    (reference differentiation.py:815-857).

    Returns (n_derivs, N) derivative values.
    """
    indices, fd_weights = get_non_uniform_fd_weights(
        points=points,
        num_neighbors=num_neighbors,
        derivative_indices=derivative_indices,
        radius=radius,
        regularize_lstsq=regularize_lstsq,
    )
    values = jnp.asarray(values)
    return jnp.einsum("nij,nj->in", fd_weights, values[indices])
