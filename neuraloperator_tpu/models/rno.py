"""RNO: Recurrent Neural Operator for time-dependent problems.

Equivalent of reference ``neuralop/models/rno.py``: lifting -> stack of
RNOBlocks over a (batch, time, channel, *spatial) sequence -> projection of
the final hidden state; autoregressive ``predict`` rollout.
"""

from typing import Callable, List, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.embeddings import GridEmbeddingND
from ..layers.padding import DomainPadding
from ..layers.rno_block import RNOBlock
from ..layers.spectral_convolution import SpectralConv
from .base_model import register_model

Number = Union[int, float]


@register_model(name="RNO")
class RNO(nn.Module):
    """See reference RNO (models/rno.py) for parameters.

    Input is strictly (batch, timesteps, in_channels, *spatial_dims).
    """

    n_modes: Tuple[int, ...]
    in_channels: int
    out_channels: int
    hidden_channels: int
    n_layers: int = 4
    lifting_channel_ratio: Number = 2
    projection_channel_ratio: Number = 2
    positional_embedding: Union[str, None] = "grid"
    non_linearity: Callable = gelu
    norm: Optional[str] = None
    norm_groups: int = 1
    complex_data: bool = False
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    channel_mlp_skip: Optional[str] = "soft-gating"
    fno_skip: Optional[str] = "linear"
    rno_skip: bool = True
    return_sequences: bool = False
    resolution_scaling_factor: Optional[Number] = None
    domain_padding: Union[None, Number, Tuple[Number, ...]] = None
    fno_block_precision: str = "full"
    stabilizer: Optional[str] = None
    max_n_modes: Optional[Tuple[int, ...]] = None
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    separable: bool = False
    preactivation: bool = False
    conv_module: type = SpectralConv

    @property
    def n_dim(self) -> int:
        return len(self.n_modes)

    def setup(self):
        emb_ch = self.n_dim if self.positional_embedding == "grid" else 0
        lifting_channels = int(self.lifting_channel_ratio * self.hidden_channels)
        self.lifting = ChannelMLP(
            in_channels=self.in_channels + emb_ch,
            out_channels=self.hidden_channels,
            hidden_channels=lifting_channels,
            n_layers=2,
            n_dim=self.n_dim,
            non_linearity=self.non_linearity,
            name="lifting",
        )
        return_seq = [True] * (self.n_layers - 1) + [self.return_sequences]
        self.layers = [
            RNOBlock(
                n_modes=tuple(self.n_modes),
                hidden_channels=self.hidden_channels,
                return_sequences=return_seq[i],
                resolution_scaling_factor=self.resolution_scaling_factor,
                max_n_modes=self.max_n_modes,
                fno_block_precision=self.fno_block_precision,
                use_channel_mlp=self.use_channel_mlp,
                channel_mlp_dropout=self.channel_mlp_dropout,
                channel_mlp_expansion=self.channel_mlp_expansion,
                non_linearity=self.non_linearity,
                stabilizer=self.stabilizer,
                norm=self.norm,
                norm_groups=self.norm_groups,
                preactivation=self.preactivation,
                fno_skip=self.fno_skip,
                channel_mlp_skip=self.channel_mlp_skip,
                complex_data=self.complex_data,
                separable=self.separable,
                factorization=self.factorization,
                rank=self.rank,
                conv_module=self.conv_module,
                fixed_rank_modes=self.fixed_rank_modes,
                implementation=self.implementation,
                name=f"rno_block_{i}",
            )
            for i in range(self.n_layers)
        ]
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

    def _domain_padding(self):
        dp = self.domain_padding
        if dp is None:
            return None
        nonzero = sum(dp) > 0 if isinstance(dp, (tuple, list)) else float(dp) > 0
        if not nonzero:
            return None
        return DomainPadding(
            domain_padding=list(dp) if isinstance(dp, (tuple, list)) else dp,
            resolution_scaling_factor=self.resolution_scaling_factor,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        init_hidden_states: Optional[List] = None,
        return_hidden_states: bool = False,
    ):
        expected_rank = 3 + self.n_dim
        if x.ndim != expected_rank:
            raise ValueError(
                f"RNO expects rank-{expected_rank} input (batch, time, "
                f"channels, spatial...), got shape {x.shape}"
            )
        if x.shape[2] != self.in_channels:
            raise ValueError(
                f"RNO expects x.shape[2] == in_channels ({self.in_channels}), "
                f"got {x.shape[2]}"
            )
        batch, timesteps = x.shape[:2]

        if init_hidden_states is None:
            init_hidden_states = [None] * self.n_layers

        flat = x.reshape(batch * timesteps, *x.shape[2:])
        if self.positional_embedding == "grid":
            emb = GridEmbeddingND(
                in_channels=self.in_channels,
                dim=self.n_dim,
                grid_boundaries=[[0.0, 1.0]] * self.n_dim,
            )
            flat = emb(flat)
        flat = self.lifting(flat)

        dp = self._domain_padding()
        if dp is not None:
            flat = dp.pad(flat)
        h_seq = flat.reshape(batch, timesteps, *flat.shape[1:])

        final_states = []
        x_seq = h_seq
        for i in range(self.n_layers):
            pred = self.layers[i](x_seq, init_hidden_states[i])
            if i < self.n_layers - 1:
                x_seq = x_seq + pred if self.rno_skip else pred
                final_states.append(x_seq[:, -1])
            else:
                x_seq = pred
                final_states.append(x_seq)
        h = final_states[-1]

        if dp is not None:
            h = dp.unpad(h)
            final_states = [dp.unpad(s) for s in final_states]

        out = self.projection(h)
        if return_hidden_states:
            return out, final_states
        return out

    def predict(self, variables, x, num_steps: int, grid_function=None):
        """Autoregressive rollout (host loop; reference rno.py:484-532)."""
        outputs = []
        states = None
        for _ in range(num_steps):
            pred, states = self.apply(
                variables, x, init_hidden_states=states,
                return_hidden_states=True,
            )
            outputs.append(pred)
            x = pred[:, None]
            if grid_function is not None:
                x = jnp.concatenate([x, grid_function(x.shape)], axis=2)
        return jnp.stack(outputs, axis=1)
