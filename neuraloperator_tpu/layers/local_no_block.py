"""LocalNOBlocks: Fourier layers with parallel local differential/DISCO branches.

Equivalent of reference ``neuralop/layers/local_no_block.py``: each layer
sums a spectral convolution, an optional finite-difference (differential)
branch and an optional DISCO local-convolution branch before norm/skip/MLP
(Liu-Schiaffini et al., "Neural Operators with Localized Integral and
Differential Kernels", ICML 2024).
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .channel_mlp import ChannelMLP, gelu
from .differential_conv import FiniteDifferenceConvolution
from .discrete_continuous_convolution import EquidistantDiscreteContinuousConv2d
from .fno_block import FNOBlocks
from .normalization_layers import AdaIN, GroupNorm, InstanceNorm
from .skip_connections import skip_connection
from .spectral_convolution import SpectralConv
from ..utils import validate_scaling_factor

Number = Union[int, float]


class LocalNOBlocks(nn.Module):
    """See reference LocalNOBlocks (local_no_block.py:21-587) for parameters."""

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, ...]
    default_in_shape: Tuple[int, ...]
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    n_layers: int = 1
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
    max_n_modes: Optional[Tuple[int, ...]] = None
    local_no_block_precision: str = "full"
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    non_linearity: Callable = gelu
    stabilizer: Optional[str] = None
    norm: Optional[str] = None
    norm_groups: int = 1
    ada_in_features: Optional[int] = None
    preactivation: bool = False
    local_no_skip: Optional[str] = "linear"
    channel_mlp_skip: Optional[str] = "soft-gating"
    separable: bool = False
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    conv_module: type = SpectralConv
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    fft_norm: str = "forward"
    enforce_hermitian_symmetry: bool = True

    @property
    def n_dim(self) -> int:
        return len(self.n_modes)

    def _layer_flags(self, flags) -> Tuple[bool, ...]:
        if isinstance(flags, bool):
            return (flags,) * self.n_layers
        return tuple(flags)

    def setup(self):
        assert len(self.n_modes) == len(self.default_in_shape)
        diff_flags = self._layer_flags(self.diff_layers)
        disco_flags = self._layer_flags(self.disco_layers)
        if self.n_dim > 3 and any(diff_flags):
            raise NotImplementedError(
                "differential convs not implemented for dims > 3"
            )
        if self.n_dim != 2 and any(disco_flags):
            raise NotImplementedError("DISCO layers only implemented for 2-D")

        rsf = validate_scaling_factor(
            self.resolution_scaling_factor, self.n_dim, self.n_layers
        )
        self.convs = [
            self.conv_module(
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                n_modes=tuple(self.n_modes),
                resolution_scaling_factor=None if rsf is None else tuple(rsf[i]),
                max_n_modes=self.max_n_modes,
                rank=self.rank,
                fixed_rank_modes=self.fixed_rank_modes,
                implementation=self.implementation,
                separable=self.separable,
                factorization=self.factorization,
                fno_block_precision=self.local_no_block_precision,
                fft_norm=self.fft_norm,
                enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
                name=f"conv_{i}",
            )
            for i in range(self.n_layers)
        ]

        diffs, diff_idx, j = [], [], 0
        for i in range(self.n_layers):
            if diff_flags[i]:
                diffs.append(
                    FiniteDifferenceConvolution(
                        in_channels=self.in_channels,
                        out_channels=self.out_channels,
                        n_dim=self.n_dim,
                        kernel_size=self.fin_diff_kernel_size,
                        groups=1 if self.mix_derivatives else self.in_channels,
                        padding=self.conv_padding_mode,
                        name=f"diff_{j}",
                    )
                )
                diff_idx.append(j)
                j += 1
            else:
                diff_idx.append(-1)
        self.differential = diffs
        self.differential_idx_list = diff_idx

        radius = self.radius_cutoff
        if radius is None:
            radius = 2.0 / min(self.default_in_shape)
        half = max(1, round(radius * min(self.default_in_shape) / 2) * 2 // 2)
        kernel_size = 2 * half + 1
        discos, disco_idx, j = [], [], 0
        for i in range(self.n_layers):
            if disco_flags[i]:
                discos.append(
                    EquidistantDiscreteContinuousConv2d(
                        in_channels=self.in_channels,
                        out_channels=self.out_channels,
                        kernel_shape=tuple(self.disco_kernel_shape),
                        kernel_size=kernel_size,
                        groups=self.disco_groups,
                        use_bias=self.disco_bias,
                        padding_mode=(
                            "periodic"
                            if self.conv_padding_mode in ("periodic", "circular")
                            else "zeros"
                        ),
                        name=f"disco_{j}",
                    )
                )
                disco_idx.append(j)
                j += 1
            else:
                disco_idx.append(-1)
        self.local_convs = discos
        self.disco_idx_list = disco_idx

        if self.local_no_skip is not None:
            self.local_no_skips = [
                skip_connection(
                    self.in_channels,
                    self.out_channels,
                    skip_type=self.local_no_skip,
                    n_dim=self.n_dim,
                    name=f"local_no_skip_{i}",
                )
                for i in range(self.n_layers)
            ]
        else:
            self.local_no_skips = None

        if self.use_channel_mlp:
            self.channel_mlps = [
                ChannelMLP(
                    in_channels=self.out_channels,
                    hidden_channels=round(
                        self.out_channels * self.channel_mlp_expansion
                    ),
                    dropout=self.channel_mlp_dropout,
                    n_dim=self.n_dim,
                    name=f"channel_mlp_{i}",
                )
                for i in range(self.n_layers)
            ]
            if self.channel_mlp_skip is not None:
                self.channel_mlp_skips = [
                    skip_connection(
                        self.in_channels,
                        self.out_channels,
                        skip_type=self.channel_mlp_skip,
                        n_dim=self.n_dim,
                        name=f"channel_mlp_skip_{i}",
                    )
                    for i in range(self.n_layers)
                ]
            else:
                self.channel_mlp_skips = None
        else:
            self.channel_mlps = None
            self.channel_mlp_skips = None

        n_norms = 2
        if self.norm is None:
            self.norms = None
        elif self.norm == "instance_norm":
            self.norms = [
                InstanceNorm(name=f"norm_{j}")
                for j in range(self.n_layers * n_norms)
            ]
        elif self.norm == "group_norm":
            self.norms = [
                GroupNorm(
                    num_groups=self.norm_groups,
                    num_channels=self.out_channels,
                    name=f"norm_{j}",
                )
                for j in range(self.n_layers * n_norms)
            ]
        elif self.norm == "ada_in":
            self.norms = [
                AdaIN(
                    embed_dim=self.ada_in_features,
                    in_channels=self.out_channels,
                    name=f"norm_{j}",
                )
                for j in range(self.n_layers * n_norms)
            ]
        else:
            raise ValueError(f"unsupported norm {self.norm!r}")

    def _apply_norm(self, j, x, ada_in_embedding):
        norm = self.norms[j]
        if isinstance(norm, AdaIN):
            return norm(x, ada_in_embedding)
        return norm(x)

    def __call__(
        self,
        x: jnp.ndarray,
        index: int = 0,
        output_shape: Optional[Tuple[int, ...]] = None,
        ada_in_embedding=None,
    ) -> jnp.ndarray:
        # reference implements post-activation ordering (local_no_block.py:455+)
        x_skip = None
        if self.local_no_skips is not None:
            x_skip = self.local_no_skips[index](x)
            x_skip = self.convs[index].transform(x_skip, output_shape=output_shape)
        x_skip_mlp = None
        if self.channel_mlps is not None and self.channel_mlp_skips is not None:
            x_skip_mlp = self.channel_mlp_skips[index](x)
            x_skip_mlp = self.convs[index].transform(
                x_skip_mlp, output_shape=output_shape
            )

        if self.stabilizer == "tanh":
            x = jnp.tanh(x)

        h = self.convs[index](x, output_shape=output_shape)

        if self.differential_idx_list[index] != -1:
            # rescale the discrete derivative by the relative grid width
            gw = 1.0 / (x.shape[-1] / self.default_in_shape[0])
            d = self.differential[self.differential_idx_list[index]](x, gw)
            d = self.convs[index].transform(d, output_shape=output_shape)
            h = h + d
        if self.disco_idx_list[index] != -1:
            lc = self.local_convs[self.disco_idx_list[index]](x)
            lc = self.convs[index].transform(lc, output_shape=output_shape)
            h = h + lc

        if self.norms is not None:
            h = self._apply_norm(2 * index, h, ada_in_embedding)

        x = h + x_skip if x_skip is not None else h

        if (self.channel_mlps is not None) or (index < self.n_layers - 1):
            x = self.non_linearity(x)

        if self.channel_mlps is not None:
            if x_skip_mlp is not None:
                x = self.channel_mlps[index](x) + x_skip_mlp
            else:
                x = self.channel_mlps[index](x)
            if self.norms is not None:
                x = self._apply_norm(2 * index + 1, x, ada_in_embedding)
            if index < self.n_layers - 1:
                x = self.non_linearity(x)
        return x
