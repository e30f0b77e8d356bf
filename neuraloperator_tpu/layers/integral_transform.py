"""Kernel integral transform over neighborhoods (the GNO core).

Equivalent of reference ``neuralop/layers/integral_transform.py``: for each
output point x, integrate a learned kernel k(x, y[, f(y)]) over neighbors
A(x), optionally multiplied by f(y) and/or mollifier weights.

TPU-native layout: neighborhoods come in *padded* form
(``neighbors_index`` (m, k) + ``neighbors_mask``), so gathers and the
reduction are static-shape; the kernel MLP evaluates as one big
(m·k, features) matmul on the MXU. The reference's CSR dict is also
accepted (converted semantics via segment reduction) for parity.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .channel_mlp import LinearChannelMLP, gelu
from .segment_csr import masked_segment_reduce, segment_csr

_TRANSFORM_TYPES = (
    "linear_kernelonly",
    "linear",
    "nonlinear_kernelonly",
    "nonlinear",
)


class IntegralTransform(nn.Module):
    """See reference IntegralTransform docstring (integral_transform.py:9-107)."""

    channel_mlp_layers: Sequence[int]
    channel_mlp_non_linearity: Callable = gelu
    transform_type: str = "linear"
    weighting_fn: Optional[Callable] = None
    reduction: str = "sum"

    def setup(self):
        if self.transform_type not in _TRANSFORM_TYPES:
            raise ValueError(
                f"transform_type={self.transform_type}, expected one of "
                f"{_TRANSFORM_TYPES}"
            )
        self.channel_mlp = LinearChannelMLP(
            layers=list(self.channel_mlp_layers),
            non_linearity=self.channel_mlp_non_linearity,
            name="channel_mlp",
        )

    def __call__(self, y, neighbors, x=None, f_y=None, weights=None):
        """y: (n, d1); x: (m, d2) or None (=y); f_y: (n, d3) or (b, n, d3).

        neighbors: padded dict with 'neighbors_index' (m, k) and
        'neighbors_mask' (m, k) [+ optional 'neighbors_norm' (m, k)].
        Returns (m, d4) or (b, m, d4).
        """
        if "neighbors_row_splits" in neighbors:
            from .neighbor_search import csr_to_padded

            neighbors = csr_to_padded(neighbors)

        if x is None:
            x = y
        idx = neighbors["neighbors_index"]  # (m, k)
        mask = neighbors["neighbors_mask"]  # (m, k)
        m, k = idx.shape

        rep_features = y[idx]  # (m, k, d1)
        self_features = jnp.broadcast_to(
            x[:, None, :], (m, k, x.shape[-1])
        )
        agg = jnp.concatenate([rep_features, self_features], axis=-1)

        batched = f_y is not None and f_y.ndim == 3
        in_features = None
        if f_y is not None:
            in_features = f_y[:, idx, :] if batched else f_y[idx]
            # (b, m, k, d3) or (m, k, d3)

        if f_y is not None and self.transform_type in (
            "nonlinear_kernelonly",
            "nonlinear",
        ):
            if batched:
                b = f_y.shape[0]
                agg = jnp.broadcast_to(agg[None], (b,) + agg.shape)
            agg = jnp.concatenate([agg, in_features], axis=-1)

        kernel = self.channel_mlp(agg)  # (..., m, k, d4)

        if f_y is not None and self.transform_type != "nonlinear_kernelonly":
            kernel = kernel * in_features if kernel.ndim == in_features.ndim else (
                kernel[None] * in_features
            )

        reduction = self.reduction
        nbr_weights = neighbors.get("neighbors_norm")
        if nbr_weights is None:
            nbr_weights = weights
        if nbr_weights is None and self.weighting_fn is not None:
            raise KeyError(
                "a weighting function requires neighborhoods with norms/weights"
            )
        if nbr_weights is not None:
            w = nbr_weights
            if self.weighting_fn is not None:
                w = self.weighting_fn(w)
            kernel = kernel * w[..., None]
            reduction = "sum"

        return masked_segment_reduce(kernel, mask, reduction=reduction)
