"""UQNO: uncertainty-quantified neural operator.

Equivalent of reference ``neuralop/models/uqno.py``: pairs a (frozen)
solution model with a trainable residual model whose output is a pointwise
quantile band. In JAX the "frozen" part is natural: pass the solution
parameters without taking gradients w.r.t. them (e.g. ``jax.lax.
stop_gradient`` or simply exclude them from the optimizer pytree).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base_model import register_model


@register_model(name="UQNO")
class UQNO(nn.Module):
    """Returns (solution(x), residual_band(x)).

    ``base_model`` and ``residual_model`` are flax modules; the base model's
    parameters receive ``stop_gradient`` so only the residual model trains
    (reference uqno.py:48-60).
    """

    base_model: Any
    residual_model: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, **kwargs):
        solution = self.base_model(x, **kwargs)
        solution = jax.lax.stop_gradient(solution)
        quantile_band = self.residual_model(x, **kwargs)
        return solution, quantile_band
