"""LocalNO: FNO skeleton with localized integral/differential kernels.

Equivalent of reference ``neuralop/models/local_no.py``: grid embedding ->
lifting -> LocalNOBlocks (spectral + differential + DISCO branches) ->
projection. Requires ``default_in_shape`` for the DISCO stencil precompute.
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.embeddings import GridEmbeddingND
from ..layers.local_no_block import LocalNOBlocks
from ..layers.padding import DomainPadding
from .base_model import register_model

Number = Union[int, float]


@register_model(name="LocalNO")
class LocalNO(nn.Module):
    """See reference LocalNO (models/local_no.py) for parameters."""

    n_modes: Tuple[int, ...]
    in_channels: int
    out_channels: int
    hidden_channels: int
    default_in_shape: Tuple[int, ...]
    n_layers: int = 4
    disco_layers: Union[bool, Tuple[bool, ...]] = True
    disco_kernel_shape: Tuple[int, ...] = (2, 4)
    radius_cutoff: Optional[float] = None
    domain_length: Tuple[float, ...] = (2.0, 2.0)
    disco_groups: int = 1
    disco_bias: bool = True
    diff_layers: Union[bool, Tuple[bool, ...]] = True
    conv_padding_mode: str = "periodic"
    fin_diff_kernel_size: int = 3
    mix_derivatives: bool = True
    lifting_channel_ratio: Number = 2
    projection_channel_ratio: Number = 2
    positional_embedding: Union[str, None] = "grid"
    non_linearity: Callable = gelu
    norm: Optional[str] = None
    preactivation: bool = False
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    channel_mlp_skip: Optional[str] = "soft-gating"
    local_no_skip: Optional[str] = "linear"
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    domain_padding: Union[None, Number, Tuple[Number, ...]] = None
    local_no_block_precision: str = "full"
    stabilizer: Optional[str] = None
    max_n_modes: Optional[Tuple[int, ...]] = None
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    separable: bool = False

    @property
    def n_dim(self) -> int:
        return len(self.n_modes)

    def setup(self):
        embedding_channels = self.n_dim if self.positional_embedding == "grid" else 0
        self.lifting = ChannelMLP(
            in_channels=self.in_channels + embedding_channels,
            out_channels=self.hidden_channels,
            hidden_channels=int(self.lifting_channel_ratio * self.hidden_channels),
            n_layers=2,
            n_dim=self.n_dim,
            non_linearity=self.non_linearity,
            name="lifting",
        )
        self.local_no_blocks = LocalNOBlocks(
            in_channels=self.hidden_channels,
            out_channels=self.hidden_channels,
            n_modes=tuple(self.n_modes),
            default_in_shape=tuple(self.default_in_shape),
            resolution_scaling_factor=self.resolution_scaling_factor,
            n_layers=self.n_layers,
            disco_layers=self.disco_layers,
            disco_kernel_shape=tuple(self.disco_kernel_shape),
            radius_cutoff=self.radius_cutoff,
            domain_length=tuple(self.domain_length),
            disco_groups=self.disco_groups,
            disco_bias=self.disco_bias,
            diff_layers=self.diff_layers,
            conv_padding_mode=self.conv_padding_mode,
            fin_diff_kernel_size=self.fin_diff_kernel_size,
            mix_derivatives=self.mix_derivatives,
            max_n_modes=self.max_n_modes,
            local_no_block_precision=self.local_no_block_precision,
            use_channel_mlp=True,
            channel_mlp_dropout=self.channel_mlp_dropout,
            channel_mlp_expansion=self.channel_mlp_expansion,
            non_linearity=self.non_linearity,
            stabilizer=self.stabilizer,
            norm=self.norm,
            preactivation=self.preactivation,
            local_no_skip=self.local_no_skip,
            channel_mlp_skip=self.channel_mlp_skip,
            separable=self.separable,
            factorization=self.factorization,
            rank=self.rank,
            fixed_rank_modes=self.fixed_rank_modes,
            implementation=self.implementation,
            name="local_no_blocks",
        )
        self.projection = ChannelMLP(
            in_channels=self.hidden_channels,
            out_channels=self.out_channels,
            hidden_channels=int(
                self.projection_channel_ratio * self.hidden_channels
            ),
            n_layers=2,
            n_dim=self.n_dim,
            non_linearity=self.non_linearity,
            name="projection",
        )

    def __call__(self, x: jnp.ndarray, output_shape=None) -> jnp.ndarray:
        if self.positional_embedding == "grid":
            emb = GridEmbeddingND(
                in_channels=self.in_channels,
                dim=self.n_dim,
                grid_boundaries=[[0.0, 1.0]] * self.n_dim,
            )
            x = emb(x)
        x = self.lifting(x)
        dp = None
        if self.domain_padding is not None and (
            (isinstance(self.domain_padding, (tuple, list)) and sum(self.domain_padding) > 0)
            or (isinstance(self.domain_padding, (int, float)) and self.domain_padding > 0)
        ):
            dp = DomainPadding(
                domain_padding=self.domain_padding,
                resolution_scaling_factor=self.resolution_scaling_factor,
            )
            x = dp.pad(x)
        if output_shape is None:
            output_shapes = [None] * self.n_layers
        elif isinstance(output_shape, tuple):
            output_shapes = [None] * (self.n_layers - 1) + [output_shape]
        else:
            output_shapes = list(output_shape)
        for i in range(self.n_layers):
            x = self.local_no_blocks(x, i, output_shape=output_shapes[i])
        if dp is not None:
            x = dp.unpad(x)
        return self.projection(x)
