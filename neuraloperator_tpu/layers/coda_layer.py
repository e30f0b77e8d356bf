"""CODALayer: codomain attention for operator transformers.

Equivalent of reference ``neuralop/layers/coda_layer.py``: channel groups
are treated as token *functions*; K/Q/V/multi-head-projection/mixer are all
FNO blocks; attention scores come from inner products of flattened K/Q
functions (optionally evaluated at a downsampled resolution) with softmax
and temperature.
"""

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .channel_mlp import gelu
from .fno_block import FNOBlocks
from .normalization_layers import GroupNorm
from .resample import resample
from .spectral_convolution import SpectralConv

Number = Union[int, float]


def _identity(x):
    return x


class CODALayer(nn.Module):
    """See reference CODALayer (coda_layer.py:16-479) for parameters."""

    n_modes: Tuple[int, ...]
    n_heads: int = 1
    token_codimension: int = 1
    head_codimension: Optional[int] = None
    codimension_size: Optional[int] = None
    per_channel_attention: bool = True
    permutation_eq: bool = True
    norm: Optional[str] = "instance_norm"
    temperature: float = 1.0
    nonlinear_attention: bool = False
    scale: Optional[float] = None
    resolution_scaling_factor: Optional[float] = None
    non_linearity: Callable = gelu
    use_channel_mlp: bool = True
    channel_mlp_expansion: float = 1.0
    fno_skip: str = "linear"
    channel_mlp_skip: str = "linear"
    preactivation: bool = False
    separable: bool = False
    factorization: Optional[str] = "tucker"
    rank: float = 1.0
    conv_module: type = SpectralConv
    fixed_rank_modes: bool = False
    implementation: str = "factorized"
    enforce_hermitian_symmetry: bool = True

    @property
    def n_dim(self) -> int:
        return len(self.n_modes)

    @property
    def _token_codim(self) -> int:
        return 1 if self.per_channel_attention else self.token_codimension

    @property
    def _head_codim(self) -> int:
        if self.per_channel_attention:
            return 1
        return self.head_codimension or self.token_codimension

    @property
    def _scale(self) -> float:
        if self.scale is not None:
            return self.scale
        return 0.5 if self.per_channel_attention else 1.0

    def _norm_module(self, channels: int, name: str):
        if self.norm is None:
            return None
        if self.norm == "instance_norm":
            # instance norm with affine params == GroupNorm(groups=channels)
            return GroupNorm(
                num_groups=channels, num_channels=channels, name=name
            )
        raise ValueError(f"unknown norm {self.norm!r}")

    def setup(self):
        token_codim = self._token_codim
        head_codim = self._head_codim
        shared = dict(
            use_channel_mlp=self.use_channel_mlp,
            preactivation=self.preactivation,
            channel_mlp_skip=self.channel_mlp_skip,
            channel_mlp_dropout=0.0,
            rank=self.rank,
            channel_mlp_expansion=self.channel_mlp_expansion,
            fixed_rank_modes=self.fixed_rank_modes,
            implementation=self.implementation,
            separable=self.separable,
            factorization=self.factorization,
            conv_module=self.conv_module,
            enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
        )
        kqv_nl = self.non_linearity if self.nonlinear_attention else _identity
        kqv = dict(
            in_channels=token_codim,
            out_channels=self.n_heads * head_codim,
            n_modes=tuple(self.n_modes),
            non_linearity=kqv_nl,
            fno_skip="linear",
            norm=None,
            n_layers=1,
        )
        self.Key = FNOBlocks(
            resolution_scaling_factor=self._scale, name="Key", **kqv, **shared
        )
        self.Query = FNOBlocks(
            resolution_scaling_factor=self._scale, name="Query", **kqv, **shared
        )
        self.Value = FNOBlocks(
            resolution_scaling_factor=1, name="Value", **kqv, **shared
        )
        if self.n_heads * head_codim != token_codim:
            self.multi_head_proj = FNOBlocks(
                in_channels=self.n_heads * head_codim,
                out_channels=token_codim,
                n_modes=tuple(self.n_modes),
                resolution_scaling_factor=1,
                non_linearity=_identity,
                fno_skip="linear",
                norm=None,
                n_layers=1,
                name="multi_head_proj",
                **shared,
            )
        else:
            self.multi_head_proj = None

        self.attention_normalizer = self._norm_module(
            token_codim, "attention_normalizer"
        )
        mixer_channels = (
            token_codim if self.permutation_eq else self.codimension_size
        )
        self.mixer = FNOBlocks(
            in_channels=mixer_channels,
            out_channels=mixer_channels,
            n_modes=tuple(self.n_modes),
            resolution_scaling_factor=1,
            non_linearity=self.non_linearity,
            norm="instance_norm",
            fno_skip=self.fno_skip,
            n_layers=2,
            name="mixer",
            **shared,
        )
        self.norm1 = self._norm_module(
            token_codim if self.permutation_eq else self.codimension_size,
            "norm1",
        )
        self.mixer_in_normalizer = self._norm_module(
            mixer_channels, "mixer_in_normalizer"
        )
        self.mixer_out_normalizer = self._norm_module(
            mixer_channels, "mixer_out_normalizer"
        )

    def _maybe(self, norm, x):
        return x if norm is None else norm(x)

    def compute_attention(self, tokens: jnp.ndarray, batch_size: int):
        """tokens: (b*t, d, spatial...) -> attention output, same layout.

        Mirrors reference ``compute_attention`` (coda_layer.py:274-340).
        """
        k = self.Key(tokens)
        q = self.Query(tokens)
        v = self.Value(tokens)
        t = k.shape[0] // batch_size
        d = k.shape[1] // self.n_heads

        def heads(z, dd):
            z = z.reshape(batch_size, t, self.n_heads, dd, *z.shape[-self.n_dim:])
            z = jnp.swapaxes(z, 1, 2)
            return z.reshape(batch_size, self.n_heads, t, -1)

        kf, qf, vf = heads(k, d), heads(q, d), heads(v, d)
        dprod = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / (
            jnp.sqrt(1.0 * kf.shape[-1]) * self.temperature
        )
        dprod = jax.nn.softmax(dprod, axis=-1)
        attention = jnp.einsum("bhts,bhsd->bhtd", dprod, vf)
        attention = attention.reshape(
            batch_size, self.n_heads, t, d, *v.shape[-self.n_dim:]
        )
        attention = jnp.swapaxes(attention, 1, 2)
        return attention.reshape(
            batch_size * t, self.n_heads * d, *v.shape[-self.n_dim:]
        )

    def __call__(self, x: jnp.ndarray, output_shape=None) -> jnp.ndarray:
        if self.resolution_scaling_factor is not None and output_shape is None:
            output_shape = [
                int(s * self.resolution_scaling_factor)
                for s in x.shape[-self.n_dim:]
            ]
        if self.permutation_eq:
            return self._forward_equivariant(x, output_shape)
        return self._forward_non_equivariant(x, output_shape)

    def _forward_equivariant(self, x, output_shape=None):
        batch_size = x.shape[0]
        input_shape = x.shape[-self.n_dim:]
        token_codim = self._token_codim
        assert x.shape[1] % token_codim == 0
        t = x.shape[1] // token_codim
        tokens = x.reshape(batch_size * t, token_codim, *input_shape)

        tokens_norm = self._maybe(self.norm1, tokens)
        attention = self.compute_attention(tokens_norm, batch_size)
        if self.multi_head_proj is not None:
            attention = self.multi_head_proj(attention)
        attention = self._maybe(self.attention_normalizer, attention + tokens)

        output = self._maybe(self.mixer_in_normalizer, attention)
        for i in range(2):
            output = self.mixer(output, i, output_shape=tuple(input_shape))
        output = self._maybe(self.mixer_out_normalizer, output) + attention

        output = output.reshape(
            batch_size, t * output.shape[1], *output.shape[-self.n_dim:]
        )
        if output_shape is not None:
            output = resample(
                output,
                [
                    j / i
                    for i, j in zip(output.shape[-self.n_dim:], output_shape)
                ],
                list(range(-self.n_dim, 0)),
                output_shape=tuple(output_shape),
            )
        return output

    def _forward_non_equivariant(self, x, output_shape=None):
        batch_size = x.shape[0]
        input_shape = x.shape[-self.n_dim:]
        token_codim = self._token_codim
        t = x.shape[1] // token_codim
        tokens = self._maybe(self.norm1, x)
        tokens = tokens.reshape(batch_size * t, token_codim, *input_shape)

        attention = self.compute_attention(tokens, batch_size)
        if self.multi_head_proj is not None:
            attention = self.multi_head_proj(attention)
        attention = self._maybe(self.attention_normalizer, attention + tokens)

        attention = attention.reshape(
            batch_size, t * attention.shape[1], *attention.shape[-self.n_dim:]
        )
        output = self._maybe(self.mixer_in_normalizer, attention)
        for i in range(2):
            output = self.mixer(output, i, output_shape=tuple(input_shape))
        output = self._maybe(self.mixer_out_normalizer, output) + attention
        if output_shape is not None:
            output = resample(
                output,
                [
                    j / i
                    for i, j in zip(output.shape[-self.n_dim:], output_shape)
                ],
                list(range(-self.n_dim, 0)),
                output_shape=tuple(output_shape),
            )
        return output
