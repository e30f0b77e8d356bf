"""GNOBlock: neighbor search + positional embedding + integral transform.

Equivalent of reference ``neuralop/layers/gno_block.py:13-250``. The
neighbor search is either precomputed (pass ``neighbors=...`` — the
recommended TPU pipeline, search once per geometry on the host or with the
padded jit search) or run inside the call with a static
``max_neighbors`` budget.
"""

from typing import Callable, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import SinusoidalEmbedding
from .integral_transform import IntegralTransform
from .neighbor_search import padded_neighbor_search


class GNOBlock(nn.Module):
    """See reference GNOBlock docstring for parameter definitions."""

    in_channels: int
    out_channels: int
    coord_dim: int
    radius: float
    max_neighbors: int = 32
    transform_type: str = "linear"
    weighting_fn: Optional[Callable] = None
    reduction: str = "sum"
    pos_embedding_type: Optional[str] = "transformer"
    pos_embedding_channels: int = 32
    pos_embedding_max_positions: int = 10000
    channel_mlp_layers: tuple = (128, 256, 128)
    channel_mlp_non_linearity: Callable = None

    @property
    def pos_embedding(self):
        if self.pos_embedding_type in ("nerf", "transformer"):
            return SinusoidalEmbedding(
                in_channels=self.coord_dim,
                num_frequencies=self.pos_embedding_channels,
                embedding_type=self.pos_embedding_type,
                max_positions=self.pos_embedding_max_positions,
            )
        return None

    def _kernel_layers(self) -> List[int]:
        emb = self.pos_embedding
        kernel_in = (
            emb.out_channels * 2 if emb is not None else self.coord_dim * 2
        )
        if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
            kernel_in += self.in_channels
        layers = list(self.channel_mlp_layers)
        if layers[0] != kernel_in:
            layers = [kernel_in] + layers
        if layers[-1] != self.out_channels:
            layers = layers + [self.out_channels]
        return layers

    def setup(self):
        from .channel_mlp import gelu

        self.integral_transform = IntegralTransform(
            channel_mlp_layers=tuple(self._kernel_layers()),
            channel_mlp_non_linearity=self.channel_mlp_non_linearity or gelu,
            transform_type=self.transform_type,
            weighting_fn=self.weighting_fn,
            reduction=self.reduction,
            name="integral_transform",
        )

    def __call__(self, y, x, f_y=None, neighbors=None):
        """y: (n, d) input points; x: (m, d) output queries; f_y features.

        Returns (m, out_channels) or (batch, m, out_channels).
        """
        if neighbors is None:
            neighbors = padded_neighbor_search(
                y,
                x,
                self.radius,
                self.max_neighbors,
                return_norm=self.weighting_fn is not None,
            )
        emb = self.pos_embedding
        if emb is not None:
            y_embed = emb(y)
            x_embed = emb(x)
        else:
            y_embed, x_embed = y, x
        return self.integral_transform(
            y=y_embed, neighbors=neighbors, x=x_embed, f_y=f_y
        )
