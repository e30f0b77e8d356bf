"""Meta-losses: weighted sums, fieldwise aggregation, adaptive balancing.

Equivalent of reference ``neuralop/losses/meta_losses.py``. The adaptive
aggregators (SoftAdapt / ReLoBRaLo) carry loss-history state; in JAX style
that state lives on the object as host-side numpy buffers updated outside
the jitted loss computation (the weights are treated as constants w.r.t.
autodiff, matching the reference's ``no_grad`` blocks).
"""

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class FieldwiseAggregatorLoss:
    """Dispatch per-field losses over slices of the output tensor
    (reference meta_losses.py:14-79)."""

    def __init__(self, losses: dict, mappings: dict, logging: bool = False):
        assert mappings.keys() == losses.keys(), (
            "Mappings and losses must use the same keying"
        )
        self.losses = losses
        self.mappings = mappings
        self.logging = logging

    def __call__(self, pred, truth, **kwargs):
        loss = 0.0
        loss_record = {}
        for field, indices in self.mappings.items():
            pred_field = pred[indices].reshape(-1, 1)
            truth_field = truth[indices]
            field_loss = self.losses[field](pred_field, truth_field)
            loss = loss + field_loss
            if self.logging:
                loss_record[field] = field_loss
        loss = loss / len(self.mappings)
        if self.logging:
            return loss, loss_record
        return loss


class WeightedSumLoss:
    """Weighted sum of losses (reference meta_losses.py:82-105)."""

    def __init__(self, losses, weights=None):
        if weights is None:
            weights = [1.0 / len(losses)] * len(losses)
        if len(weights) != len(losses):
            raise ValueError("Each loss must have a weight.")
        self.losses = list(zip(losses, weights))

    def __call__(self, *args, **kwargs):
        total = 0.0
        for loss, weight in self.losses:
            total = total + weight * loss(*args, **kwargs)
        return total

    def __str__(self):
        return "Combined loss: " + " ".join(
            f"{loss} (weight: {w})" for loss, w in self.losses
        )


class Aggregator:
    """Base for adaptive loss balancing (reference meta_losses.py:114-180)."""

    def __init__(self, params=None, num_losses: int = 2,
                 weights: Optional[Dict[str, float]] = None):
        self.num_losses = num_losses
        self.weights = weights

    def weigh_losses(self, losses: Dict) -> Dict:
        if self.weights is None:
            return losses
        w = dict(self.weights)
        for key in losses:
            w.setdefault(key, 1.0)
        return {k: w[k] * v for k, v in losses.items()}


class SoftAdapt(Aggregator):
    """SoftAdapt adaptive weighting (reference meta_losses.py:183-285).

    Weights losses by exp of their ratio to the previous step's values.
    History buffers are host numpy (weights are non-differentiable).
    """

    def __init__(self, params=None, num_losses=2, eps=1e-8, weights=None):
        super().__init__(params, num_losses, weights)
        self.eps = eps
        self.prev_losses = np.zeros(num_losses)

    def __call__(self, losses: Dict, step: int):
        losses = self.weigh_losses(losses)
        keys = list(losses.keys())
        vals = [losses[k] for k in keys]
        host_vals = np.array([float(v) for v in vals])

        if step == 0:
            self.prev_losses = host_vals.copy()
            lmbda = np.ones(self.num_losses)
            return sum(vals), jnp.asarray(lmbda)

        normalizer = (host_vals / (self.prev_losses + self.eps)).max()
        lmbda = np.exp(host_vals / (self.prev_losses + self.eps) - normalizer)
        lmbda_sum = lmbda.sum()
        loss = sum(float(l) * v for l, v in zip(lmbda, vals))
        loss = loss * (self.num_losses / (lmbda_sum + self.eps))
        self.prev_losses = host_vals.copy()
        return loss, jnp.asarray(lmbda)

    forward = __call__


class Relobralo(Aggregator):
    """ReLoBRaLo adaptive weighting (reference meta_losses.py:288-447)."""

    def __init__(
        self,
        params=None,
        num_losses=2,
        alpha=0.95,
        beta=0.99,
        tau=1.0,
        eps=1e-8,
        weights=None,
        seed: int = 0,
    ):
        super().__init__(params, num_losses, weights)
        self.alpha = alpha
        self.beta = beta
        self.tau = tau
        self.eps = eps
        self.init_losses = np.zeros(num_losses)
        self.prev_losses = np.zeros(num_losses)
        self.lmbda_ema = np.ones(num_losses)
        self._rng = np.random.RandomState(seed)

    def __call__(self, losses: Dict, step: int):
        losses = self.weigh_losses(losses)
        keys = list(losses.keys())
        vals = [losses[k] for k in keys]
        host_vals = np.array([float(v) for v in vals])

        if step == 0:
            self.init_losses = host_vals.copy()
            self.prev_losses = host_vals.copy()
            return sum(vals), jnp.asarray(self.lmbda_ema)

        norm_prev = (host_vals / (self.tau * self.prev_losses + self.eps)).max()
        norm_init = (host_vals / (self.tau * self.init_losses + self.eps)).max()
        rho = float(self._rng.binomial(1, self.beta))

        lmbda_prev = np.exp(
            host_vals / (self.tau * self.prev_losses + self.eps) - norm_prev
        )
        lmbda_init = np.exp(
            host_vals / (self.tau * self.init_losses + self.eps) - norm_init
        )
        lmbda_prev *= self.num_losses / (lmbda_prev.sum() + self.eps)
        lmbda_init *= self.num_losses / (lmbda_init.sum() + self.eps)

        self.lmbda_ema = self.alpha * (
            rho * self.lmbda_ema + (1.0 - rho) * lmbda_init
        )
        self.lmbda_ema += (1.0 - self.alpha) * lmbda_prev

        loss = sum(float(l) * v for l, v in zip(self.lmbda_ema, vals))
        self.prev_losses = host_vals.copy()
        return loss, jnp.asarray(self.lmbda_ema)

    forward = __call__
