"""FNOGNO: FNO on a regular grid + output GNO to query points.

Equivalent of reference ``neuralop/models/fnogno.py``: latent FNO over the
gridded input, then a kernel integral (GNO) from the grid to arbitrary
output points, then pointwise projection.
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


@register_model(name="FNOGNO")
class FNOGNO(nn.Module):
    """See reference FNOGNO docstring for parameters."""

    in_channels: int
    out_channels: int
    projection_channel_ratio: int = 4
    gno_coord_dim: int = 3
    gno_radius: float = 0.033
    gno_transform_type: str = "linear"
    gno_weighting_function: Optional[str] = None
    gno_weight_function_scale: float = 1.0
    gno_pos_embed_type: Optional[str] = "transformer"
    gno_embed_channels: int = 32
    gno_embed_max_positions: int = 10000
    gno_channel_mlp_hidden_layers: Tuple[int, ...] = (512, 256)
    gno_max_neighbors: int = 32
    gno_batched: bool = False
    fno_n_modes: Tuple[int, ...] = (16, 16, 16)
    fno_hidden_channels: int = 64
    fno_lifting_channel_ratio: int = 2
    fno_n_layers: int = 4
    fno_resolution_scaling_factor: Optional[float] = None
    fno_block_precision: str = "full"
    fno_use_channel_mlp: bool = True
    fno_channel_mlp_dropout: float = 0.0
    fno_channel_mlp_expansion: float = 0.5
    fno_non_linearity: Callable = gelu
    fno_stabilizer: Optional[str] = None
    fno_norm: Optional[str] = None
    fno_norm_groups: int = 1
    fno_ada_in_features: Optional[int] = None
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
    def _ada_in_dim(self) -> Optional[int]:
        if self.fno_norm != "ada_in":
            return None
        if self.fno_ada_in_features is not None:
            return 2 * self.fno_ada_in_dim * self.fno_ada_in_features
        return self.fno_ada_in_dim

    def setup(self):
        self.lifting = ChannelMLP(
            in_channels=self.in_channels + self.in_coord_dim,
            hidden_channels=self.fno_lifting_channel_ratio
            * self.fno_hidden_channels,
            out_channels=self.fno_hidden_channels,
            n_layers=3,
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
                sq_radius=self.gno_radius ** 2,
                scale=self.gno_weight_function_scale,
            )
        self.gno = GNOBlock(
            in_channels=self.fno_hidden_channels,
            out_channels=self.fno_hidden_channels,
            coord_dim=self.gno_coord_dim,
            radius=self.gno_radius,
            max_neighbors=self.gno_max_neighbors,
            weighting_fn=weight_fn,
            pos_embedding_type=self.gno_pos_embed_type,
            pos_embedding_channels=self.gno_embed_channels,
            pos_embedding_max_positions=self.gno_embed_max_positions,
            channel_mlp_layers=tuple(self.gno_channel_mlp_hidden_layers),
            transform_type=self.gno_transform_type,
            name="gno",
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

    def _ada_embed(self, ada_in):
        if ada_in is None:
            return None
        ada_in = ada_in.reshape(-1)
        if self.fno_ada_in_features is not None:
            emb = SinusoidalEmbedding(
                in_channels=self.fno_ada_in_dim,
                num_frequencies=self.fno_ada_in_features,
                embedding_type="transformer",
            )
            return emb(ada_in[None, None, :]).reshape(-1)
        return ada_in

    def latent_embedding(self, in_p, f, ada_in=None):
        """in_p: (n1..nk, k) geometry; f: (b, n1..nk, c) or (n1..nk, c)."""
        batched = f.ndim == self.in_coord_dim + 2
        if not batched:
            f = f[None]
        b = f.shape[0]
        geo = jnp.broadcast_to(in_p[None], (b,) + in_p.shape)
        h = jnp.concatenate([f, geo], axis=-1)
        # (b, n1..nk, c) -> (b, c, n1..nk)
        ndim = h.ndim
        h = jnp.transpose(h, (0, ndim - 1, *range(1, ndim - 1)))
        ada_embed = self._ada_embed(ada_in) if self.fno_norm == "ada_in" else None
        h = self.lifting(h)
        for idx in range(self.fno_n_layers):
            h = self.fno_blocks(h, idx, ada_in_embedding=ada_embed)
        return h if batched else h[0]

    def integrate_latent(self, in_p, out_p, latent_embed, neighbors=None):
        batched = latent_embed.ndim == self.in_coord_dim + 2
        k = self.in_coord_dim
        if batched:
            b = latent_embed.shape[0]
            latent = jnp.transpose(
                latent_embed, (0, *range(2, k + 2), 1)
            ).reshape(b, -1, self.fno_hidden_channels)
        else:
            latent = jnp.transpose(
                latent_embed, (*range(1, k + 1), 0)
            ).reshape(-1, self.fno_hidden_channels)
        out = self.gno(
            y=in_p.reshape(-1, in_p.shape[-1]),
            x=out_p,
            f_y=latent,
            neighbors=neighbors,
        )
        if out.ndim == 2:
            out = out[None]
        out = jnp.transpose(out, (0, 2, 1))  # (b, c, n_out)
        out = self.projection(out)
        if batched:
            return jnp.transpose(out, (0, 2, 1))
        return jnp.transpose(out[0], (1, 0))

    def __call__(self, in_p, out_p, f, ada_in=None, neighbors=None):
        """in_p: (n1..nk, k) grid coords; out_p: (n_out, k) query points;
        f: (b, n1..nk, c) input function. Reference fnogno.py:409-424."""
        latent_embed = self.latent_embedding(in_p=in_p, f=f, ada_in=ada_in)
        return self.integrate_latent(
            in_p=in_p, out_p=out_p, latent_embed=latent_embed,
            neighbors=neighbors,
        )
