"""U-shaped Neural Operator (UNO).

Equivalent of reference ``neuralop/models/uno.py``: per-layer output
channels / modes / resolution scalings, with horizontal skip connections
that spectrally resample earlier-layer outputs to the current resolution and
concatenate them on the channel dim.
"""

from typing import Callable, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.embeddings import GridEmbedding2D, GridEmbeddingND
from ..layers.fno_block import FNOBlocks
from ..layers.padding import DomainPadding
from ..layers.resample import resample
from ..layers.skip_connections import skip_connection
from ..layers.spectral_convolution import SpectralConv
from .base_model import register_model

Number = Union[int, float]


@register_model(name="UNO")
class UNO(nn.Module):
    """See reference UNO docstring (models/uno.py:19-119) for parameters."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    lifting_channels: int = 256
    projection_channels: int = 256
    positional_embedding: Union[str, None, GridEmbeddingND] = "grid"
    n_layers: int = 4
    uno_out_channels: Tuple[int, ...] = None
    uno_n_modes: Tuple[Tuple[int, ...], ...] = None
    uno_scalings: Tuple[Tuple[Number, ...], ...] = None
    horizontal_skips_map: Optional[Dict[int, int]] = None
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    non_linearity: Callable = gelu
    norm: Optional[str] = None
    norm_groups: int = 1
    preactivation: bool = False
    fno_skip: Optional[str] = "linear"
    horizontal_skip: Optional[str] = "linear"
    channel_mlp_skip: Optional[str] = "soft-gating"
    separable: bool = False
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    domain_padding: Union[None, Number, Tuple[Number, ...]] = None
    enforce_hermitian_symmetry: bool = True

    @property
    def n_dim(self) -> int:
        return len(self.uno_n_modes[0])

    @property
    def skips_map(self) -> Dict[int, int]:
        if self.horizontal_skips_map is not None:
            return dict(self.horizontal_skips_map)
        # default U-shape: {n-1: 0, n-2: 1, ...} (reference uno.py:221-228)
        return {
            self.n_layers - i - 1: i for i in range(self.n_layers // 2)
        }

    @property
    def end_to_end_scaling(self):
        factors = [1.0] * self.n_dim
        for s in self.uno_scalings:
            s = [s] * self.n_dim if isinstance(s, (int, float)) else list(s)
            factors = [a * b for a, b in zip(factors, s)]
        return factors

    def _embedding(self):
        pe = self.positional_embedding
        if pe == "grid":
            return GridEmbeddingND(
                in_channels=self.in_channels,
                dim=self.n_dim,
                grid_boundaries=[[0.0, 1.0]] * self.n_dim,
            )
        if isinstance(pe, (GridEmbedding2D, GridEmbeddingND)) or pe is None:
            return pe
        raise ValueError(f"invalid positional_embedding {pe!r}")

    def setup(self):
        assert self.uno_out_channels is not None
        assert self.uno_n_modes is not None
        assert self.uno_scalings is not None
        assert len(self.uno_out_channels) == self.n_layers
        assert len(self.uno_n_modes) == self.n_layers
        assert len(self.uno_scalings) == self.n_layers

        lifting_in = self.in_channels + (
            self.n_dim if self._embedding() is not None else 0
        )
        self.lifting = ChannelMLP(
            in_channels=lifting_in,
            out_channels=self.hidden_channels,
            hidden_channels=self.lifting_channels,
            n_layers=2,
            n_dim=self.n_dim,
            name="lifting",
        )

        skips_map = self.skips_map
        blocks = []
        h_skips = {}
        prev_out = self.hidden_channels
        for i in range(self.n_layers):
            if i in skips_map:
                prev_out = prev_out + self.uno_out_channels[skips_map[i]]
            blocks.append(
                FNOBlocks(
                    in_channels=prev_out,
                    out_channels=self.uno_out_channels[i],
                    n_modes=tuple(self.uno_n_modes[i]),
                    channel_mlp_dropout=self.channel_mlp_dropout,
                    channel_mlp_expansion=self.channel_mlp_expansion,
                    resolution_scaling_factor=[tuple(
                        [self.uno_scalings[i]] * self.n_dim
                        if isinstance(self.uno_scalings[i], (int, float))
                        else self.uno_scalings[i]
                    )],
                    non_linearity=self.non_linearity,
                    norm=self.norm,
                    norm_groups=self.norm_groups,
                    preactivation=self.preactivation,
                    fno_skip=self.fno_skip,
                    channel_mlp_skip=self.channel_mlp_skip,
                    rank=self.rank,
                    fixed_rank_modes=self.fixed_rank_modes,
                    implementation=self.implementation,
                    separable=self.separable,
                    factorization=self.factorization,
                    enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
                    n_layers=1,
                    name=f"block_{i}",
                )
            )
            if i in skips_map.values():
                h_skips[str(i)] = skip_connection(
                    self.uno_out_channels[i],
                    self.uno_out_channels[i],
                    skip_type=self.horizontal_skip,
                    n_dim=self.n_dim,
                    name=f"horizontal_skip_{i}",
                )
            prev_out = self.uno_out_channels[i]

        self.blocks = blocks
        self.h_skips = h_skips
        self.projection = ChannelMLP(
            in_channels=prev_out,
            out_channels=self.out_channels,
            hidden_channels=self.projection_channels,
            n_layers=2,
            n_dim=self.n_dim,
            non_linearity=self.non_linearity,
            name="projection",
        )

    def _domain_padding(self):
        dp = self.domain_padding
        if dp is None:
            return None
        nonzero = sum(dp) > 0 if isinstance(dp, (list, tuple)) else float(dp) > 0
        if not nonzero:
            return None
        return DomainPadding(
            domain_padding=list(dp) if isinstance(dp, (list, tuple)) else dp,
            resolution_scaling_factor=self.end_to_end_scaling,
        )

    def __call__(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        embedding = self._embedding()
        if embedding is not None:
            x = embedding(x)
        x = self.lifting(x)
        dp = self._domain_padding()
        if dp is not None:
            x = dp.pad(x)
        output_shape = tuple(
            int(round(i * j))
            for i, j in zip(x.shape[-self.n_dim:], self.end_to_end_scaling)
        )

        skips_map = self.skips_map
        skip_outputs = {}
        for i in range(self.n_layers):
            if i in skips_map:
                skip_val = skip_outputs[skips_map[i]]
                factors = [
                    m / n
                    for m, n in zip(
                        x.shape[-self.n_dim:], skip_val.shape[-self.n_dim:]
                    )
                ]
                t = resample(skip_val, factors, list(range(-self.n_dim, 0)))
                x = jnp.concatenate([x, t], axis=1)
            cur_output = output_shape if i == self.n_layers - 1 else None
            x = self.blocks[i](x, 0, output_shape=cur_output)
            if i in skips_map.values():
                skip_outputs[i] = self.h_skips[str(i)](x)

        if dp is not None:
            x = dp.unpad(x)
        return self.projection(x)
