"""Data losses: Lp, H1, Hdiv, MSE, pointwise quantile.

Equivalent of reference ``neuralop/losses/data_losses.py`` with identical
quadrature and reduction semantics. Losses are plain callables over jnp
arrays, safe to close over in a jitted train step.
"""

import math
from typing import List, Sequence, Union

import jax.numpy as jnp

from .differentiation import FiniteDiff


def _flatten_spatial(x: jnp.ndarray, d: int) -> jnp.ndarray:
    return x.reshape(*x.shape[:-d], -1)


class LpLoss:
    """Relative/absolute Lp norm between discretized d-dim functions.

    Mirrors reference ``LpLoss`` (data_losses.py:21-213): spatial dims are
    always quadrature-averaged; ``reduction`` applies to batch+channel dims.
    """

    def __init__(self, d=1, p=2, measure=1.0, reduction="sum", eps=1e-8):
        self.d = d
        self.p = p
        self.eps = eps
        assert reduction in ("sum", "mean"), reduction
        self.reduction = reduction
        self.measure = (
            [measure] * d if isinstance(measure, (int, float)) else list(measure)
        )

    @property
    def name(self):
        return f"L{self.p}_{self.d}Dloss"

    def uniform_quadrature(self, x) -> List[float]:
        return [self.measure[-j] / x.shape[-j] for j in range(self.d, 0, -1)][::-1]

    def reduce_all(self, x):
        return jnp.sum(x) if self.reduction == "sum" else jnp.mean(x)

    def _pow_sum(self, flat):
        if self.p == 1:
            return jnp.sum(jnp.abs(flat), axis=-1)
        if self.p % 2 == 0:
            return jnp.sum(flat ** self.p, axis=-1)
        return jnp.sum(jnp.abs(flat) ** self.p, axis=-1)

    def abs(self, x, y, quadrature=None, take_root=True):
        if quadrature is None:
            quadrature = self.uniform_quadrature(x)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        const = math.prod(quadrature)
        diff = const * self._pow_sum(
            _flatten_spatial(x, self.d) - _flatten_spatial(y, self.d)
        )
        if take_root and self.p != 1:
            diff = diff ** (1.0 / self.p)
        return jnp.squeeze(self.reduce_all(diff))

    def rel(self, x, y, take_root=True):
        diff = self._pow_sum(
            _flatten_spatial(x, self.d) - _flatten_spatial(y, self.d)
        )
        ynorm = self._pow_sum(_flatten_spatial(y, self.d))
        if take_root and self.p != 1:
            diff = (diff ** (1.0 / self.p)) / (ynorm ** (1.0 / self.p) + self.eps)
        else:
            diff = diff / (ynorm + self.eps)
        return jnp.squeeze(self.reduce_all(diff))

    def __call__(self, y_pred, y, **kwargs):
        return self.rel(y_pred, y)


class H1Loss:
    """Relative/absolute H1 Sobolev norm via finite-difference gradients.

    Mirrors reference ``H1Loss`` (data_losses.py:215-492).
    """

    def __init__(
        self,
        d=1,
        measure=1.0,
        reduction="sum",
        eps=1e-8,
        periodic_in_x=True,
        periodic_in_y=True,
        periodic_in_z=True,
    ):
        assert 0 < d < 4, "H1Loss implemented for d in {1, 2, 3}"
        self.d = d
        self.eps = eps
        assert reduction in ("sum", "mean"), reduction
        self.reduction = reduction
        self.measure = (
            [measure] * d if isinstance(measure, (int, float)) else list(measure)
        )
        self.periodic = (periodic_in_x, periodic_in_y, periodic_in_z)

    @property
    def name(self):
        return f"H1_{self.d}DLoss"

    def uniform_quadrature(self, x) -> List[float]:
        return [self.measure[-j] / x.shape[-j] for j in range(self.d, 0, -1)][::-1]

    def reduce_all(self, x):
        return jnp.sum(x) if self.reduction == "sum" else jnp.mean(x)

    def _term_list(self, x, quadrature):
        fd = FiniteDiff(
            dim=self.d,
            h=quadrature[0] if self.d == 1 else quadrature,
            periodic_in_x=self.periodic[0],
            periodic_in_y=self.periodic[1],
            periodic_in_z=self.periodic[2],
        )
        t = [_flatten_spatial(x, self.d)]
        derivs = [fd.dx]
        if self.d >= 2:
            derivs.append(fd.dy)
        if self.d >= 3:
            derivs.append(fd.dz)
        for dfn in derivs:
            t.append(_flatten_spatial(dfn(x), self.d))
        return t

    def _terms(self, x, y, quadrature):
        return self._term_list(x, quadrature), self._term_list(y, quadrature)

    def ynorm_sq(self, y, quadrature=None):
        """Per-sample squared H1 seminorm sum of ``y`` — the ``rel()``
        denominator before the root.

        The denominator depends only on the target, so it is constant
        across training; the Trainer's device-dataset path precomputes it
        once per staged dataset and passes it back through
        ``rel(..., ynorm_sq=...)``, removing the y-derivative stencils
        from every train step (the 0.74 ms H1 slice of the NS-128
        roofline, BASELINE.md round-3)."""
        if quadrature is None:
            quadrature = self.uniform_quadrature(y)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        ty = self._term_list(y, quadrature)
        return sum(jnp.sum(b ** 2, axis=-1) for b in ty)

    def abs(self, x, y, quadrature=None, take_root=True):
        if quadrature is None:
            quadrature = self.uniform_quadrature(x)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        tx, ty = self._terms(x, y, quadrature)
        const = math.prod(quadrature)
        diff = sum(
            const * jnp.sum((a - b) ** 2, axis=-1) for a, b in zip(tx, ty)
        )
        if take_root:
            diff = diff ** 0.5
        return jnp.squeeze(self.reduce_all(diff))

    def rel(self, x, y, quadrature=None, take_root=True, ynorm_sq=None):
        if quadrature is None:
            quadrature = self.uniform_quadrature(x)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        if ynorm_sq is None:
            tx, ty = self._terms(x, y, quadrature)
            diff = sum(jnp.sum((a - b) ** 2, axis=-1) for a, b in zip(tx, ty))
            ynorm = sum(jnp.sum(b ** 2, axis=-1) for b in ty)
        else:
            # finite differences are linear: d(x) - d(y) = d(x - y), so
            # with the denominator precomputed only ONE stencil pass (on
            # the difference) is needed — half the FD work per step
            td = self._term_list(x - y, quadrature)
            diff = sum(jnp.sum(a ** 2, axis=-1) for a in td)
            ynorm = ynorm_sq
        if take_root:
            diff = (diff ** 0.5) / (ynorm ** 0.5 + self.eps)
        else:
            diff = diff / (ynorm + self.eps)
        return jnp.squeeze(self.reduce_all(diff))

    def __call__(self, y_pred, y, quadrature=None, ynorm_sq=None, **kwargs):
        return self.rel(y_pred, y, quadrature=quadrature, ynorm_sq=ynorm_sq)


class HdivLoss:
    """Relative/absolute H(div) norm: L2 of values + L2 of divergence.

    Mirrors reference ``HdivLoss`` (data_losses.py:493-766): inputs are
    vector fields with components on the channel dim.
    """

    def __init__(
        self,
        d=2,
        measure=1.0,
        reduction="sum",
        eps=1e-8,
        periodic_in_x=True,
        periodic_in_y=True,
        periodic_in_z=True,
    ):
        assert 0 < d < 4
        self.d = d
        self.eps = eps
        assert reduction in ("sum", "mean")
        self.reduction = reduction
        self.measure = (
            [measure] * d if isinstance(measure, (int, float)) else list(measure)
        )
        self.periodic = (periodic_in_x, periodic_in_y, periodic_in_z)

    @property
    def name(self):
        return f"Hdiv_{self.d}DLoss"

    def uniform_quadrature(self, x):
        return [self.measure[-j] / x.shape[-j] for j in range(self.d, 0, -1)][::-1]

    def reduce_all(self, x):
        return jnp.sum(x) if self.reduction == "sum" else jnp.mean(x)

    def _div(self, v, quadrature):
        fd = FiniteDiff(
            dim=self.d,
            h=quadrature[0] if self.d == 1 else quadrature,
            periodic_in_x=self.periodic[0],
            periodic_in_y=self.periodic[1],
            periodic_in_z=self.periodic[2],
        )
        return fd.divergence(v)

    def rel(self, x, y, quadrature=None, take_root=True):
        if quadrature is None:
            quadrature = self.uniform_quadrature(x)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        xf = _flatten_spatial(x, self.d)
        yf = _flatten_spatial(y, self.d)
        dx = _flatten_spatial(self._div(x, quadrature), self.d)
        dy = _flatten_spatial(self._div(y, quadrature), self.d)
        # collapse channel components of the value term
        diff = jnp.sum((xf - yf) ** 2, axis=(-1, -2)) + jnp.sum(
            (dx - dy) ** 2, axis=-1
        )
        ynorm = jnp.sum(yf ** 2, axis=(-1, -2)) + jnp.sum(dy ** 2, axis=-1)
        if take_root:
            diff = (diff ** 0.5) / (ynorm ** 0.5 + self.eps)
        else:
            diff = diff / (ynorm + self.eps)
        return jnp.squeeze(self.reduce_all(diff))

    def abs(self, x, y, quadrature=None, take_root=True):
        if quadrature is None:
            quadrature = self.uniform_quadrature(x)
        elif isinstance(quadrature, float):
            quadrature = [quadrature] * self.d
        const = math.prod(quadrature)
        xf = _flatten_spatial(x, self.d)
        yf = _flatten_spatial(y, self.d)
        dx = _flatten_spatial(self._div(x, quadrature), self.d)
        dy = _flatten_spatial(self._div(y, quadrature), self.d)
        diff = const * (
            jnp.sum((xf - yf) ** 2, axis=(-1, -2))
            + jnp.sum((dx - dy) ** 2, axis=-1)
        )
        if take_root:
            diff = diff ** 0.5
        return jnp.squeeze(self.reduce_all(diff))

    def __call__(self, y_pred, y, quadrature=None, **kwargs):
        return self.rel(y_pred, y, quadrature=quadrature)


class MSELoss:
    """Plain mean-squared error (reference data_losses.py:850-879)."""

    def __init__(self, reduction="mean"):
        assert reduction in ("sum", "mean")
        self.reduction = reduction

    @property
    def name(self):
        return "MSELoss"

    def __call__(self, y_pred, y, **kwargs):
        se = (y_pred - y) ** 2
        if self.reduction == "mean":
            return jnp.mean(se)
        # reference sums over batch, averages within each sample
        return jnp.sum(jnp.mean(se.reshape(se.shape[0], -1), axis=-1))


class PointwiseQuantileLoss:
    """Quantile (pinball) loss for UQNO residual bands.

    Mirrors reference ``PointwiseQuantileLoss`` (data_losses.py:767-849):
    ``y_pred`` is the predicted band width, ``y`` the true point error.
    """

    def __init__(self, alpha: float, reduction="sum"):
        self.alpha = alpha
        assert reduction in ("sum", "mean")
        self.reduction = reduction

    @property
    def name(self):
        return "PointwiseQuantileLoss"

    def __call__(self, y_pred, y, **kwargs):
        quantile = 1.0 - self.alpha
        yscale = jnp.abs(y)
        ptwise = jnp.maximum(
            quantile * (yscale - y_pred), (1 - quantile) * (y_pred - yscale)
        )
        per_sample = jnp.mean(
            ptwise.reshape(ptwise.shape[0], -1), axis=-1, keepdims=True
        )
        if self.reduction == "sum":
            return jnp.squeeze(jnp.sum(per_sample))
        return jnp.squeeze(jnp.mean(per_sample))
