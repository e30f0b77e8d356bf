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
import numpy as np


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
    """Unified 1/2/3-D spectral differentiation.

    API-complete counterpart of reference ``FourierDiff``
    (``/root/reference/neuralop/losses/differentiation.py:858-1360``): exact
    derivatives of periodic signals via multiplication by ``(ik)^n`` in
    Fourier space, with optional Fourier continuation ('Legendre' or 'Gram')
    for non-periodic data and optional low-pass filtering. ``dx``
    differentiates the first spatial axis (axis ``-dim``), ``dy`` the next,
    ``dz`` the last, matching the reference's axis conventions.

    TPU note: everything between the forward and inverse FFTs runs
    split-real — the ``(ik)^n`` multiplier is decomposed into a real
    amplitude ``prod_j k_j^{o_j}`` and a phase ``i^{sum o_j}`` applied as a
    real rotation, so no complex HLO op other than the FFTs is emitted.
    """

    def __init__(self, dim: int, L=None, use_fc=False, fc_degree: int = 4,
                 fc_n_additional_pts: int = 50, low_pass_filter_ratio=None):
        if dim not in (1, 2, 3):
            raise ValueError("dim must be 1, 2, or 3")
        self.dim = dim
        if L is None:
            L = 2 * float(jnp.pi)
        if not isinstance(L, (tuple, list)):
            L = (float(L),) * dim
        if len(L) != dim:
            raise ValueError(
                f"For {dim}D, L must be a single float or a {dim}-tuple"
            )
        self.L = tuple(float(v) for v in L)
        self.use_fc = use_fc
        self.fc_degree = fc_degree
        self.fc_n_additional_pts = fc_n_additional_pts
        self.low_pass_filter_ratio = low_pass_filter_ratio

        self.FC = None
        if use_fc:
            from ..layers.fourier_continuation import FCGram, FCLegendre

            name = "legendre" if use_fc is True else str(use_fc).lower()
            if name == "legendre":
                self.FC = FCLegendre(
                    d=fc_degree, n_additional_pts=fc_n_additional_pts
                )
            elif name == "gram":
                self.FC = FCGram(
                    d=fc_degree, n_additional_pts=fc_n_additional_pts
                )
            else:
                raise ValueError(
                    f"Given FC input {use_fc!r} is not valid. "
                    "Must be 'legendre' or 'gram'."
                )
        # kept for backward compatibility with earlier revisions
        self.fc = self.FC

    def compute_multiple_derivatives(self, u, derivatives):
        """Compute several derivatives sharing ONE forward/backward FFT.

        ``derivatives``: list of int orders (1-D) or order tuples (2/3-D),
        e.g. ``[(1, 0), (0, 1)]``. Returns a list of real arrays in the same
        order (reference ``compute_multiple_derivatives``,
        differentiation.py:1002-1027).
        """
        orders = [
            (int(o),) if isinstance(o, (int, np.integer)) else tuple(o)
            for o in derivatives
        ]
        for o in orders:
            if len(o) != self.dim:
                raise ValueError(
                    f"For {self.dim}D, each derivative spec needs "
                    f"{self.dim} orders, got {o}"
                )

        u = jnp.asarray(u)
        axes = list(range(-self.dim, 0))
        sizes = [u.shape[a] for a in axes]
        L = list(self.L)

        if self.FC is not None:
            # extend to a smooth periodic function on a larger domain, then
            # restrict the derivatives back (reference FC route). Use the
            # FC layer's OWN point count: FCGram decrements an odd
            # n_additional_pts, and a mismatch would scale every
            # derivative by (n+requested)/(n+actual)
            extra = self.FC.n_additional_pts
            u = self.FC.extend(u, dim=self.dim)
            L = [l * (n + extra) / n for l, n in zip(L, sizes)]
            sizes = [u.shape[a] for a in axes]

        # one forward FFT, split-real thereafter
        uh = jnp.fft.fftn(u.astype(jnp.float32), axes=axes)
        ur, ui = jnp.real(uh), jnp.imag(uh)

        # per-axis angular frequencies (host-side numpy constants)
        ks = [
            2 * np.pi * np.fft.fftfreq(n, d=l / n)
            for n, l in zip(sizes, L)
        ]
        if self.low_pass_filter_ratio is not None:
            # symmetric per-axis cutoff: zero |freq index| >= int(n/2 * r)
            # (the 1-D reference semantics, applied per axis)
            for j, n in enumerate(sizes):
                cutoff = int((n // 2 + 1) * self.low_pass_filter_ratio)
                idx = np.minimum(np.arange(n), n - np.arange(n))
                filt = (idx < cutoff).astype(np.float32)
                shape = [1] * u.ndim
                shape[axes[j]] = n
                f = jnp.asarray(filt.reshape(shape))
                ur, ui = ur * f, ui * f

        outs = []
        for o in orders:
            # (i k)^o = i^{sum o} * prod_j k_j^{o_j}: real amplitude K and a
            # quarter-turn phase applied as a real rotation of (re, im)
            K = np.ones((), np.float32)
            for j, (k, oj, n) in enumerate(zip(ks, o, sizes)):
                if oj == 0:
                    continue
                shape = [1] * self.dim
                shape[j] = n
                K = K * (k.astype(np.float64) ** oj).reshape(shape)
            K = jnp.asarray(
                np.broadcast_to(K, sizes).astype(np.float32)
            ).reshape((1,) * (u.ndim - self.dim) + tuple(sizes))
            phase = sum(o) % 4
            if phase == 0:
                dr, di = ur * K, ui * K
            elif phase == 1:
                dr, di = -ui * K, ur * K
            elif phase == 2:
                dr, di = -ur * K, -ui * K
            else:
                dr, di = ui * K, -ur * K
            out = jnp.real(
                jnp.fft.ifftn(jax.lax.complex(dr, di), axes=axes)
            )
            if self.FC is not None:
                out = self.FC.restrict(out, dim=self.dim)
            outs.append(out)
        return outs

    def derivative(self, u, order):
        """Derivative for an order tuple, e.g. ``(1, 0)`` = d/dx in 2-D
        (reference differentiation.py:1028-1057)."""
        order = tuple(order)
        if len(order) != self.dim:
            raise ValueError(
                f"For {self.dim}D, order must be a tuple with {self.dim} "
                "elements"
            )
        return self.compute_multiple_derivatives(u, [order])[0]

    def partial(self, u, direction: str = "x", order: int = 1):
        """Partial derivative along a named direction
        (reference differentiation.py:1059-1088)."""
        if direction == "x":
            return self.dx(u, order=order)
        if direction == "y" and self.dim >= 2:
            return self.dy(u, order=order)
        if direction == "z" and self.dim >= 3:
            return self.dz(u, order=order)
        raise ValueError(
            f"Invalid direction '{direction}' for dimension {self.dim}"
        )

    def _unit(self, axis: int, order: int):
        o = [0] * self.dim
        o[axis] = order
        return tuple(o)

    def dx(self, u, order: int = 1):
        return self.derivative(u, self._unit(0, order))

    def dy(self, u, order: int = 1):
        if self.dim < 2:
            raise ValueError("dy method only available for 2D and 3D")
        return self.derivative(u, self._unit(1, order))

    def dz(self, u, order: int = 1):
        if self.dim < 3:
            raise ValueError("dz method only available for 3D")
        return self.derivative(u, self._unit(2, order))

    def laplacian(self, u):
        """∇²u, all second derivatives sharing one FFT."""
        specs = [self._unit(j, 2) for j in range(self.dim)]
        parts = self.compute_multiple_derivatives(u, specs)
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    def gradient(self, u):
        """∇u as a vector field stacked on axis ``-dim-1``
        (reference differentiation.py:1131-1138)."""
        specs = [self._unit(j, 1) for j in range(self.dim)]
        parts = self.compute_multiple_derivatives(u, specs)
        if self.dim == 1:
            return parts[0][..., None, :]
        return jnp.stack(parts, axis=-self.dim - 1)

    def divergence(self, u):
        """∇·u for a vector field with components on axis ``-dim-1``
        (reference differentiation.py:1140-1153)."""
        u = jnp.asarray(u)
        if u.shape[-self.dim - 1] != self.dim:
            raise ValueError(
                f"For {self.dim}D, input must have {self.dim} components "
                "in the vector dimension"
            )
        comps = [_take(u, -self.dim - 1, j) for j in range(self.dim)]
        out = self.dx(comps[0])
        if self.dim >= 2:
            out = out + self.dy(comps[1])
        if self.dim >= 3:
            out = out + self.dz(comps[2])
        return out

    def curl(self, u):
        """∇×u (2-D scalar / 3-D vector; reference :1155-1175)."""
        u = jnp.asarray(u)
        if self.dim == 1:
            raise ValueError("curl not defined for 1D")
        if u.shape[-self.dim - 1] != self.dim:
            raise ValueError(
                f"For {self.dim}D, input must have {self.dim} components "
                "in the vector dimension"
            )
        comps = [_take(u, -self.dim - 1, j) for j in range(self.dim)]
        if self.dim == 2:
            return self.dx(comps[1]) - self.dy(comps[0])
        cx = self.dy(comps[2]) - self.dz(comps[1])
        cy = self.dz(comps[0]) - self.dx(comps[2])
        cz = self.dx(comps[1]) - self.dy(comps[0])
        return jnp.stack([cx, cy, cz], axis=-4)


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
