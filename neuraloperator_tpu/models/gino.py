"""GINO: Geometry-Informed Neural Operator.

Equivalent of reference ``neuralop/models/gino.py``: point cloud -> input
GNO onto a latent regular grid -> lifting -> latent FNO blocks -> output GNO
to arbitrary query points -> pointwise projection. Supports dict-keyed
output query sets and AdaIN conditioning on a scalar parameter.
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.embeddings import SinusoidalEmbedding
from ..layers.fno_block import FNOBlocks
from ..layers.gno_block import GNOBlock
from ..layers.gno_weighting_functions import dispatch_weighting_fn
from ..layers.spectral_convolution import SpectralConv
from .base_model import register_model


@register_model(name="GINO")
class GINO(nn.Module):
    """See reference GINO docstring (models/gino.py) for parameters."""

    in_channels: int
    out_channels: int
    latent_feature_channels: Optional[int] = None
    projection_channel_ratio: int = 4
    gno_coord_dim: int = 3
    in_gno_radius: float = 0.033
    out_gno_radius: float = 0.033
    in_gno_transform_type: str = "linear"
    out_gno_transform_type: str = "linear"
    gno_weighting_function: Optional[str] = None
    gno_weight_function_scale: float = 1.0
    in_gno_pos_embed_type: Optional[str] = "transformer"
    out_gno_pos_embed_type: Optional[str] = "transformer"
    fno_in_channels: int = 3
    fno_n_modes: Tuple[int, ...] = (16, 16, 16)
    fno_hidden_channels: int = 64
    fno_lifting_channel_ratio: int = 2
    fno_n_layers: int = 4
    gno_embed_channels: int = 32
    gno_embed_max_positions: int = 10000
    in_gno_channel_mlp_hidden_layers: Tuple[int, ...] = (80, 80, 80)
    out_gno_channel_mlp_hidden_layers: Tuple[int, ...] = (512, 256)
    gno_max_neighbors: int = 32
    out_gno_tanh: Optional[str] = None
    fno_resolution_scaling_factor: Optional[float] = None
    fno_block_precision: str = "full"
    fno_use_channel_mlp: bool = True
    fno_channel_mlp_dropout: float = 0.0
    fno_channel_mlp_expansion: float = 0.5
    fno_non_linearity: Callable = gelu
    fno_stabilizer: Optional[str] = None
    fno_norm: Optional[str] = None
    fno_norm_groups: int = 1
    fno_ada_in_features: Optional[int] = 4
    fno_ada_in_dim: int = 1
    fno_preactivation: bool = False
    fno_skip: Optional[str] = "linear"
    fno_channel_mlp_skip: Optional[str] = "soft-gating"
    fno_separable: bool = False
    fno_factorization: Optional[str] = None
    fno_rank: float = 1.0
    fno_fixed_rank_modes: bool = False
    fno_implementation: str = "factorized"
    fno_conv_module: type = SpectralConv

    @property
    def in_coord_dim(self) -> int:
        return len(self.fno_n_modes)

    @property
    def _in_gno_out_channels(self) -> int:
        # nonlinear kernels keep the input channel count (reference :237-240)
        if self.in_gno_transform_type in ("nonlinear", "nonlinear_kernelonly"):
            return self.in_channels
        return self.fno_in_channels

    @property
    def _fno_in_channels(self) -> int:
        c = self._in_gno_out_channels
        if self.latent_feature_channels is not None:
            c += self.latent_feature_channels
        return c

    def setup(self):
        self.gno_in = GNOBlock(
            in_channels=self.in_channels,
            out_channels=self._in_gno_out_channels,
            coord_dim=self.gno_coord_dim,
            radius=self.in_gno_radius,
            max_neighbors=self.gno_max_neighbors,
            reduction="mean",
            weighting_fn=None,
            pos_embedding_type=self.in_gno_pos_embed_type,
            pos_embedding_channels=self.gno_embed_channels,
            pos_embedding_max_positions=self.gno_embed_max_positions,
            channel_mlp_layers=tuple(self.in_gno_channel_mlp_hidden_layers),
            transform_type=self.in_gno_transform_type,
            name="gno_in",
        )
        self.lifting = ChannelMLP(
            in_channels=self._fno_in_channels,
            hidden_channels=self.fno_lifting_channel_ratio
            * self.fno_hidden_channels,
            out_channels=self.fno_hidden_channels,
            n_layers=2,
            name="lifting",
        )
        self.fno_blocks = FNOBlocks(
            n_modes=tuple(self.fno_n_modes),
            in_channels=self.fno_hidden_channels,
            out_channels=self.fno_hidden_channels,
            n_layers=self.fno_n_layers,
            resolution_scaling_factor=self.fno_resolution_scaling_factor,
            fno_block_precision=self.fno_block_precision,
            use_channel_mlp=self.fno_use_channel_mlp,
            channel_mlp_expansion=self.fno_channel_mlp_expansion,
            channel_mlp_dropout=self.fno_channel_mlp_dropout,
            non_linearity=self.fno_non_linearity,
            stabilizer=self.fno_stabilizer,
            norm=self.fno_norm,
            norm_groups=self.fno_norm_groups,
            ada_in_features=self._ada_in_dim,
            preactivation=self.fno_preactivation,
            fno_skip=self.fno_skip,
            channel_mlp_skip=self.fno_channel_mlp_skip,
            separable=self.fno_separable,
            factorization=self.fno_factorization,
            rank=self.fno_rank,
            fixed_rank_modes=self.fno_fixed_rank_modes,
            implementation=self.fno_implementation,
            conv_module=self.fno_conv_module,
            name="fno_blocks",
        )
        weight_fn = None
        if self.gno_weighting_function is not None:
            weight_fn = dispatch_weighting_fn(
                self.gno_weighting_function,
                sq_radius=self.out_gno_radius ** 2,
                scale=self.gno_weight_function_scale,
            )
        self.gno_out = GNOBlock(
            in_channels=self.fno_hidden_channels,
            out_channels=self.fno_hidden_channels,
            coord_dim=self.gno_coord_dim,
            radius=self.out_gno_radius,
            max_neighbors=self.gno_max_neighbors,
            reduction="sum",
            weighting_fn=weight_fn,
            pos_embedding_type=self.out_gno_pos_embed_type,
            pos_embedding_channels=self.gno_embed_channels,
            pos_embedding_max_positions=self.gno_embed_max_positions,
            channel_mlp_layers=tuple(self.out_gno_channel_mlp_hidden_layers),
            transform_type=self.out_gno_transform_type,
            name="gno_out",
        )
        self.projection = ChannelMLP(
            in_channels=self.fno_hidden_channels,
            out_channels=self.out_channels,
            hidden_channels=self.projection_channel_ratio
            * self.fno_hidden_channels,
            n_layers=2,
            n_dim=1,
            non_linearity=self.fno_non_linearity,
            name="projection",
        )

    @property
    def _ada_in_dim(self) -> Optional[int]:
        if self.fno_norm != "ada_in":
            return None
        if self.fno_ada_in_features is not None:
            return 2 * self.fno_ada_in_dim * self.fno_ada_in_features
        return self.fno_ada_in_dim

    def _ada_embed(self, ada_in):
        if ada_in is None:
            return None
        ada_in = ada_in.reshape(-1)
        if self.fno_ada_in_features is not None:
            emb = SinusoidalEmbedding(
                in_channels=self.fno_ada_in_dim,
                num_frequencies=self.fno_ada_in_features,
                embedding_type=self.out_gno_pos_embed_type or "transformer",
                max_positions=10000,
            )
            return emb(ada_in[None, None, :]).reshape(-1)
        return ada_in

    def latent_embedding(self, in_p, ada_in=None):
        """(b, n1..nk, c) -> (b, hidden, n1..nk) through lifting + FNO."""
        ndim = in_p.ndim
        in_p = jnp.transpose(in_p, (0, ndim - 1, *range(1, ndim - 1)))
        ada_embed = self._ada_embed(ada_in) if self.fno_norm == "ada_in" else None
        in_p = self.lifting(in_p)
        for idx in range(self.fno_n_layers):
            in_p = self.fno_blocks(in_p, idx, ada_in_embedding=ada_embed)
        return in_p

    def __call__(
        self,
        input_geom,
        latent_queries,
        output_queries,
        x=None,
        latent_features=None,
        ada_in=None,
        in_neighbors=None,
        out_neighbors=None,
    ):
        """See reference GINO.forward (gino.py:414-562) for semantics.

        Optional ``in_neighbors``/``out_neighbors`` accept precomputed padded
        neighbor dicts (the preferred TPU input pipeline).
        """
        batch_size = 1 if x is None else x.shape[0]

        input_geom = input_geom.reshape(-1, input_geom.shape[-1])
        lq_grid = latent_queries.reshape(latent_queries.shape[1:]) \
            if latent_queries.shape[0] == 1 else latent_queries
        grid_shape = lq_grid.shape[:-1]
        lq_flat = lq_grid.reshape(-1, lq_grid.shape[-1])

        in_p = self.gno_in(
            y=input_geom, x=lq_flat, f_y=x, neighbors=in_neighbors
        )
        in_p = in_p.reshape(batch_size, *grid_shape, -1)

        if latent_features is not None:
            if latent_features.shape[0] != batch_size:
                latent_features = jnp.broadcast_to(
                    latent_features,
                    (batch_size,) + latent_features.shape[1:],
                )
            in_p = jnp.concatenate([in_p, latent_features], axis=-1)

        latent_embed = self.latent_embedding(in_p, ada_in=ada_in)

        # (b, c, n1..nk) -> (b, n_pts, c)
        k = self.in_coord_dim
        latent_embed = jnp.transpose(
            latent_embed, (0, *range(2, k + 2), 1)
        ).reshape(batch_size, -1, self.fno_hidden_channels)
        if self.out_gno_tanh in ("latent_embed", "both"):
            latent_embed = jnp.tanh(latent_embed)

        def query(out_p, neighbors):
            out_p = out_p.reshape(-1, out_p.shape[-1])
            sub = self.gno_out(
                y=lq_flat, x=out_p, f_y=latent_embed, neighbors=neighbors
            )  # (b, n_out, c)
            sub = jnp.transpose(sub, (0, 2, 1))
            sub = self.projection(sub)
            return jnp.transpose(sub, (0, 2, 1))

        if isinstance(output_queries, dict):
            return {
                key: query(
                    out_p,
                    None if out_neighbors is None else out_neighbors.get(key),
                )
                for key, out_p in output_queries.items()
            }
        return query(output_queries, out_neighbors)
