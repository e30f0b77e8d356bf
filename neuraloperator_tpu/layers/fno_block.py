"""FNOBlocks: the per-layer composition of the Fourier layer.

Equivalent of reference ``neuralop/layers/fno_block.py``: spectral conv +
skip connection (+ optional local conv bias) + norm + channel MLP + channel
MLP skip + nonlinearity, in post- or pre-activation order.

Functional differences from the reference: AdaIN conditioning embeddings are
passed at call time (``ada_in_embedding=``) instead of being set on module
state, and incremental-FNO mode growth is a per-call ``n_modes`` override.
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import validate_scaling_factor
from .channel_mlp import ChannelMLP, gelu
from .complex import CGELU, ComplexValued, ctanh
from .normalization_layers import AdaIN, BatchNorm, GroupNorm, InstanceNorm
from .skip_connections import LocalConvSkip, skip_connection
from .spectral_convolution import SpectralConv

Number = Union[int, float]


class FNOBlocks(nn.Module):
    """A stack of ``n_layers`` Fourier layers with shared structure.

    Call with ``(x, index)`` to apply the ``index``-th layer (matching the
    reference's indexed forward, fno_block.py:371-414).
    """

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, ...]
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    n_layers: int = 1
    max_n_modes: Optional[Tuple[int, ...]] = None
    fno_block_precision: str = "full"
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    non_linearity: Callable = gelu
    stabilizer: Optional[str] = None
    norm: Optional[str] = None
    norm_groups: int = 1
    ada_in_features: Optional[int] = None
    preactivation: bool = False
    fno_skip: Optional[str] = "linear"
    conv_bias_kernel: int = 1
    channel_mlp_skip: Optional[str] = "soft-gating"
    complex_data: bool = False
    separable: bool = False
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    conv_module: type = SpectralConv
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    decomposition_kwargs: Optional[dict] = None
    enforce_hermitian_symmetry: bool = True
    weight_dtype: str = "float32"

    @property
    def n_dim(self) -> int:
        n = self.n_modes
        return 1 if isinstance(n, int) else len(n)

    def _layer_scaling(self, index: int):
        rsf = validate_scaling_factor(
            self.resolution_scaling_factor, self.n_dim, self.n_layers
        )
        return None if rsf is None else tuple(rsf[index])

    def setup(self):
        n_modes = (
            (self.n_modes,) if isinstance(self.n_modes, int) else tuple(self.n_modes)
        )
        conv_kwargs = {}
        if issubclass(self.conv_module, SpectralConv):
            conv_kwargs["enforce_hermitian_symmetry"] = (
                self.enforce_hermitian_symmetry
            )
            conv_kwargs["weight_dtype"] = self.weight_dtype
        self.convs = [
            self.conv_module(
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                n_modes=n_modes,
                resolution_scaling_factor=self._layer_scaling(i),
                max_n_modes=self.max_n_modes,
                rank=self.rank,
                fixed_rank_modes=self.fixed_rank_modes,
                implementation=self.implementation,
                separable=self.separable,
                factorization=self.factorization,
                fno_block_precision=self.fno_block_precision,
                complex_data=self.complex_data,
                name=f"conv_{i}",
                **conv_kwargs,
            )
            for i in range(self.n_layers)
        ]

        if self.fno_skip is not None:
            if self.fno_skip.lower() == "linear" and self.conv_bias_kernel > 1:
                def mk(name=None):
                    return LocalConvSkip(
                        self.in_channels,
                        self.out_channels,
                        self.n_dim,
                        self.conv_bias_kernel,
                        name=name,
                    )
            else:
                if self.conv_bias_kernel != 1 and self.fno_skip.lower() != "linear":
                    raise ValueError(
                        "conv_bias_kernel can only differ from 1 when fno_skip='linear'."
                    )

                def mk(name=None):
                    return skip_connection(
                        self.in_channels,
                        self.out_channels,
                        skip_type=self.fno_skip,
                        n_dim=self.n_dim,
                        name=name,
                    )

            self.fno_skips = [
                self._maybe_complex(mk, f"fno_skip_{i}")
                for i in range(self.n_layers)
            ]
        else:
            self.fno_skips = None

        if self.use_channel_mlp:
            def mk_mlp(name=None):
                return ChannelMLP(
                    in_channels=self.out_channels,
                    hidden_channels=round(
                        self.out_channels * self.channel_mlp_expansion
                    ),
                    dropout=self.channel_mlp_dropout,
                    n_dim=self.n_dim,
                    name=name,
                )

            self.channel_mlps = [
                self._maybe_complex(mk_mlp, f"channel_mlp_{i}")
                for i in range(self.n_layers)
            ]
            if self.channel_mlp_skip is not None:
                def mk_s(name=None):
                    return skip_connection(
                        self.in_channels,
                        self.out_channels,
                        skip_type=self.channel_mlp_skip,
                        n_dim=self.n_dim,
                        name=name,
                    )

                self.channel_mlp_skips = [
                    self._maybe_complex(mk_s, f"channel_mlp_skip_{i}")
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
                InstanceNorm(name=f"norm_{j}") for j in range(self.n_layers * n_norms)
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
        elif self.norm == "batch_norm":
            self.norms = [
                BatchNorm(
                    n_dim=self.n_dim,
                    num_features=self.out_channels,
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
            raise ValueError(
                f"Got norm={self.norm} but expected None or one of "
                "[instance_norm, group_norm, batch_norm, ada_in]"
            )

    def _maybe_complex(self, factory, name: str):
        if self.complex_data:
            return ComplexValued(module_factory=factory, name=name)
        return factory(name=name)

    @property
    def activation(self) -> Callable:
        return CGELU if self.complex_data else self.non_linearity

    def _apply_norm(self, j: int, x, ada_in_embedding):
        norm = self.norms[j]
        if isinstance(norm, AdaIN):
            assert ada_in_embedding is not None, (
                "norm='ada_in' requires passing ada_in_embedding to FNOBlocks"
            )
            return norm(x, ada_in_embedding)
        return norm(x)

    def __call__(
        self,
        x: jnp.ndarray,
        index: int = 0,
        output_shape: Optional[Tuple[int, ...]] = None,
        ada_in_embedding: Optional[jnp.ndarray] = None,
        n_modes: Optional[Tuple[int, ...]] = None,
    ) -> jnp.ndarray:
        if self.preactivation:
            return self._forward_preactivation(
                x, index, output_shape, ada_in_embedding, n_modes
            )
        return self._forward_postactivation(
            x, index, output_shape, ada_in_embedding, n_modes
        )

    def _forward_postactivation(
        self, x, index, output_shape, ada_in_embedding, n_modes
    ):
        x_skip_fno = None
        if self.fno_skips is not None:
            x_skip_fno = self.fno_skips[index](x)
            x_skip_fno = self.convs[index].transform(
                x_skip_fno, output_shape=output_shape
            )
        x_skip_mlp = None
        if self.channel_mlps is not None and self.channel_mlp_skips is not None:
            x_skip_mlp = self.channel_mlp_skips[index](x)
            x_skip_mlp = self.convs[index].transform(
                x_skip_mlp, output_shape=output_shape
            )

        if self.stabilizer == "tanh":
            x = ctanh(x) if self.complex_data else jnp.tanh(x)

        x_fno = self.convs[index](x, output_shape=output_shape, n_modes=n_modes)

        if self.norms is not None:
            x_fno = self._apply_norm(2 * index, x_fno, ada_in_embedding)

        x = x_fno + x_skip_fno if x_skip_fno is not None else x_fno

        if index < (self.n_layers - 1):
            x = self.activation(x)

        if self.channel_mlps is not None:
            if x_skip_mlp is not None:
                x = self.channel_mlps[index](x) + x_skip_mlp
            else:
                x = self.channel_mlps[index](x)

        if self.norms is not None:
            x = self._apply_norm(2 * index + 1, x, ada_in_embedding)

        if index < (self.n_layers - 1):
            x = self.activation(x)
        return x

    def get_block(self, indices: int) -> "SubModule":
        """Return a single-layer view sharing this stack's parameters
        (reference fno_block.py:466-476)."""
        if self.n_layers == 1:
            raise ValueError(
                "A single layer is parametrized, directly use the main class."
            )
        return SubModule(self, indices)

    def _forward_preactivation(
        self, x, index, output_shape, ada_in_embedding, n_modes
    ):
        x = self.activation(x)
        if self.norms is not None:
            x = self._apply_norm(2 * index, x, ada_in_embedding)

        x_skip_fno = None
        if self.fno_skips is not None:
            x_skip_fno = self.fno_skips[index](x)
            x_skip_fno = self.convs[index].transform(
                x_skip_fno, output_shape=output_shape
            )
        x_skip_mlp = None
        if self.channel_mlps is not None and self.channel_mlp_skips is not None:
            x_skip_mlp = self.channel_mlp_skips[index](x)
            x_skip_mlp = self.convs[index].transform(
                x_skip_mlp, output_shape=output_shape
            )

        if self.stabilizer == "tanh":
            x = ctanh(x) if self.complex_data else jnp.tanh(x)

        x_fno = self.convs[index](x, output_shape=output_shape, n_modes=n_modes)
        x = x_fno + x_skip_fno if x_skip_fno is not None else x_fno

        if index < (self.n_layers - 1):
            x = self.activation(x)
        if self.norms is not None:
            x = self._apply_norm(2 * index + 1, x, ada_in_embedding)

        if self.channel_mlps is not None:
            if x_skip_mlp is not None:
                x = self.channel_mlps[index](x) + x_skip_mlp
            else:
                x = self.channel_mlps[index](x)
        return x


class SubModule:
    """A view over one layer of an :class:`FNOBlocks` stack.

    Functional counterpart of the reference's ``SubModule``
    (fno_block.py:482-498), which shares parameters with its parent. In
    flax, parameters live outside the module, so the view is a thin
    callable that pins ``index``; the same params dict drives both the
    parent and every view.
    """

    def __init__(self, fno_blocks: FNOBlocks, index: int):
        self.fno_blocks = fno_blocks
        self.index = index

    def __call__(self, x, **kwargs):
        return self.fno_blocks(x, self.index, **kwargs)
