"""Recurrent Neural Operator cell and block (GRU in function space).

Equivalent of reference ``neuralop/layers/rno_block.py``: GRU-like
recurrence with Fourier-layer gate maps,

    z = σ(f1(x) + f2(h) + b1)
    r = σ(f3(x) + f4(h) + b2)
    h~ = selu(f5(x) + f6(r ⊙ h) + b3)
    h' = (1 - z) ⊙ h + z ⊙ h~
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .channel_mlp import gelu
from .fno_block import FNOBlocks
from .spectral_convolution import SpectralConv

Number = Union[int, float]


class RNOCell(nn.Module):
    """See reference RNOCell (rno_block.py:11-228) for parameters."""

    n_modes: Tuple[int, ...]
    hidden_channels: int
    resolution_scaling_factor: Optional[Number] = None
    max_n_modes: Optional[Tuple[int, ...]] = None
    fno_block_precision: str = "full"
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    non_linearity: Callable = gelu
    stabilizer: Optional[str] = None
    norm: Optional[str] = None
    norm_groups: int = 1
    preactivation: bool = False
    fno_skip: Optional[str] = "linear"
    channel_mlp_skip: Optional[str] = "soft-gating"
    complex_data: bool = False
    separable: bool = False
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    conv_module: type = SpectralConv
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    enforce_hermitian_symmetry: bool = True

    def _fno_kwargs(self):
        return dict(
            n_layers=1,
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
            enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
        )

    def setup(self):
        scaling = (
            None
            if not self.resolution_scaling_factor
            else self.resolution_scaling_factor
        )
        kwargs = self._fno_kwargs()
        # input gates see x (may need resolution scaling to match h)
        self.input_gates = [
            FNOBlocks(
                in_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_modes=tuple(self.n_modes),
                resolution_scaling_factor=scaling,
                name=f"input_gate_{i}",
                **kwargs,
            )
            for i in range(3)
        ]
        self.hidden_gates = [
            FNOBlocks(
                in_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_modes=tuple(self.n_modes),
                resolution_scaling_factor=None,
                name=f"hidden_gate_{i}",
                **kwargs,
            )
            for i in range(3)
        ]
        self.gate_biases = [
            self.param(f"bias_{i}", nn.initializers.normal(1.0), ())
            for i in range(3)
        ]

    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        update = jax.nn.sigmoid(
            self.input_gates[0](x) + self.hidden_gates[0](h) + self.gate_biases[0]
        )
        reset = jax.nn.sigmoid(
            self.input_gates[1](x) + self.hidden_gates[1](h) + self.gate_biases[1]
        )
        combined = (
            self.input_gates[2](x)
            + self.hidden_gates[2](reset * h)
            + self.gate_biases[2]
        )
        candidate = jax.nn.selu(combined)
        return (1.0 - update) * h + update * candidate


class RNOBlock(nn.Module):
    """Applies an RNOCell over a (batch, time, c, *spatial) sequence.

    See reference RNOBlock (rno_block.py:230-432).
    """

    n_modes: Tuple[int, ...]
    hidden_channels: int
    return_sequences: bool = False
    resolution_scaling_factor: Optional[Number] = None
    max_n_modes: Optional[Tuple[int, ...]] = None
    fno_block_precision: str = "full"
    use_channel_mlp: bool = True
    channel_mlp_dropout: float = 0.0
    channel_mlp_expansion: float = 0.5
    non_linearity: Callable = gelu
    stabilizer: Optional[str] = None
    norm: Optional[str] = None
    norm_groups: int = 1
    preactivation: bool = False
    fno_skip: Optional[str] = "linear"
    channel_mlp_skip: Optional[str] = "soft-gating"
    complex_data: bool = False
    separable: bool = False
    factorization: Optional[str] = None
    rank: Union[float, Tuple[int, ...]] = 1.0
    conv_module: type = SpectralConv
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    enforce_hermitian_symmetry: bool = True

    def setup(self):
        self.cell = RNOCell(
            n_modes=tuple(self.n_modes),
            hidden_channels=self.hidden_channels,
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
            enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
            name="cell",
        )
        self.bias_h = self.param("bias_h", nn.initializers.normal(1.0), ())

    def __call__(self, x: jnp.ndarray, h: Optional[jnp.ndarray] = None):
        batch, timesteps = x.shape[:2]
        dom_sizes = x.shape[3:]
        if h is None:
            if not self.resolution_scaling_factor:
                h_shape = (batch, self.hidden_channels, *dom_sizes)
            else:
                h_shape = (
                    batch,
                    self.hidden_channels,
                    *[
                        int(round(self.resolution_scaling_factor * s))
                        for s in dom_sizes
                    ],
                )
            h = jnp.zeros(h_shape, x.dtype) + self.bias_h

        outputs = []
        for t in range(timesteps):
            h = self.cell(x[:, t], h)
            if self.return_sequences:
                outputs.append(h)
        if self.return_sequences:
            return jnp.stack(outputs, axis=1)
        return h
