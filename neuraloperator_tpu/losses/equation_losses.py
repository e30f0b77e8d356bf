"""Physics/equation losses (PINO-style residuals).

Equivalent of reference ``neuralop/losses/equation_losses.py``. The Poisson
interior loss differentiates the model w.r.t. query coordinates; in JAX this
takes the *function* (queries -> u) rather than tensors with autograd tape,
so ``PoissonInteriorLoss`` accepts a ``u_fn`` callable and computes the
derivatives with forward-mode autodiff (cheap for scalar outputs over many
points).
"""

from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp

from .differentiation import FiniteDiff


def mse_loss(a, b):
    return jnp.mean((a - b) ** 2)


class BurgersEqnLoss:
    """FDM residual of 1-D viscous Burgers on a (time, space) grid.

    u: (batch, 1, nt, nx); residual u_t + u u_x - visc u_xx
    (reference equation_losses.py:14-60).
    """

    def __init__(self, visc=0.01, method="fdm", loss=mse_loss, domain_length=1.0):
        self.visc = visc
        self.method = method
        self.loss = loss
        if not isinstance(domain_length, (tuple, list)):
            domain_length = [domain_length] * 2
        self.domain_length = list(domain_length)

    def fdm(self, u):
        u = u.squeeze(1)
        _, nt, nx = u.shape
        dt = self.domain_length[0] / (nt - 1)
        dx = self.domain_length[1] / nx
        fd2d = FiniteDiff(
            dim=2, h=(dt, dx), periodic_in_x=False, periodic_in_y=False
        )
        dudt = fd2d.dx(u)
        dudx = fd2d.dy(u)
        dudxx = fd2d.dy(u, order=2)
        rhs = -dudx * u + self.visc * dudxx
        return self.loss(dudt, rhs)

    def __call__(self, y_pred, **kwargs):
        if self.method == "fdm":
            return self.fdm(y_pred)
        raise NotImplementedError(f"method {self.method}")


class ICLoss:
    """Initial-condition loss: compare t=0 slices
    (reference equation_losses.py:63-86)."""

    def __init__(self, loss=mse_loss):
        self.loss = loss

    def __call__(self, y_pred, y, **kwargs):
        return self.loss(y_pred[:, :, 0], y[:, :, 0])


class PoissonInteriorLoss:
    """Interior residual of nonlinear Poisson ∇·((1 + 0.1u²)∇u) = f.

    JAX formulation: pass ``u_fn``, a function mapping query coordinates
    (n, 2) -> u values (n,) for one sample (close over the model params and
    other inputs); derivatives are computed with nested jacfwd. Mirrors the
    expanded LHS of reference equation_losses.py:190-201:
    Δu + 0.1 u² Δu + 0.2 u |∇u|².
    """

    def __init__(self, method="autograd", loss=mse_loss):
        self.method = method
        self.loss = loss

    def autograd(
        self,
        u_fn: Callable[[jnp.ndarray], jnp.ndarray],
        output_queries: jnp.ndarray,
        output_source_terms_domain: jnp.ndarray,
        **kwargs,
    ):
        def pointwise(q):  # q: (2,)
            return u_fn(q[None])[0].squeeze()

        grad_fn = jax.grad(pointwise)
        hess_fn = jax.jacfwd(grad_fn)

        queries = output_queries.reshape(-1, output_queries.shape[-1])
        u = jax.vmap(pointwise)(queries)
        du = jax.vmap(grad_fn)(queries)
        hess = jax.vmap(hess_fn)(queries)
        laplacian = hess[:, 0, 0] + hess[:, 1, 1]
        norm_grad_sq = jnp.sum(du ** 2, axis=-1)
        lhs = laplacian + 0.1 * (u ** 2) * laplacian + 0.2 * u * norm_grad_sq
        return self.loss(lhs, output_source_terms_domain.reshape(lhs.shape))

    def __call__(self, u_fn, **kwargs):
        if self.method == "autograd":
            return self.autograd(u_fn, **kwargs)
        raise NotImplementedError(f"method {self.method}")


class PoissonBoundaryLoss:
    """Dirichlet boundary loss over the first ``num_boundary`` points
    (reference equation_losses.py:226-245)."""

    def __init__(self, loss=mse_loss):
        self.loss = loss

    def __call__(self, y_pred, num_boundary, y, out_sub_level=1.0, **kwargs):
        nb = int(num_boundary * out_sub_level)
        boundary_pred = y_pred.squeeze(0).squeeze(-1)[:nb]
        y_bound = y.squeeze(0).squeeze(-1)[:nb]
        return self.loss(boundary_pred, y_bound)


class PoissonEqnLoss:
    """Weighted interior residual + boundary loss
    (reference equation_losses.py:248-285)."""

    def __init__(
        self,
        boundary_weight: float,
        interior_weight: float,
        diff_method: str = "autograd",
        base_loss=mse_loss,
    ):
        self.boundary_weight = boundary_weight
        self.interior_weight = interior_weight
        self.boundary_loss = PoissonBoundaryLoss(loss=base_loss)
        self.interior_loss = PoissonInteriorLoss(
            method=diff_method, loss=base_loss
        )

    def __call__(self, u_fn, boundary_pred, y_boundary, num_boundary, **kwargs):
        interior = self.interior_weight * self.interior_loss(u_fn, **kwargs)
        bc = self.boundary_weight * self.boundary_loss(
            boundary_pred, num_boundary=num_boundary, y=y_boundary
        )
        return interior + bc
