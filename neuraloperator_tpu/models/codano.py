"""CODANO: Codomain Attention Neural Operator.

Equivalent of reference ``neuralop/models/codano.py``: each physical
variable is a token function; per-variable lifting, learnable
function-space positional encodings parameterized in Fourier space per
variable id, optional CLS token, a stack of CODALayers, and per-variable
projection. Supports variable-set extension for multi-physics pretraining.
"""

from typing import Callable, Dict, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers.channel_mlp import ChannelMLP, gelu
from ..layers.coda_layer import CODALayer
from ..layers.padding import DomainPadding
from ..layers.resample import resample
from ..layers.spectral_convolution import SpectralConv
from .base_model import register_model


@register_model(name="CODANO")
class CODANO(nn.Module):
    """See reference CODANO (models/codano.py:145+) for parameters."""

    n_modes: Tuple[Tuple[int, ...], ...] = None
    output_variable_codimension: int = 1
    lifting_channels: Optional[int] = 64
    hidden_variable_codimension: int = 32
    projection_channels: Optional[int] = 64
    use_positional_encoding: bool = False
    positional_encoding_dim: int = 8
    positional_encoding_modes: Optional[Tuple[int, ...]] = None
    static_channel_dim: int = 0
    variable_ids: Optional[Tuple[str, ...]] = None
    use_horizontal_skip_connection: bool = False
    horizontal_skips_map: Optional[Dict[int, int]] = None
    n_layers: int = 4
    per_layer_scaling_factors: Optional[Tuple] = None
    n_heads: Optional[Tuple[int, ...]] = None
    attention_scaling_factors: Optional[Tuple[float, ...]] = None
    conv_module: type = SpectralConv
    nonlinear_attention: bool = False
    non_linearity: Callable = gelu
    attention_token_dim: int = 1
    per_channel_attention: bool = False
    domain_padding: Optional[float] = 0.25
    enable_cls_token: bool = False
    enforce_hermitian_symmetry: bool = True

    @property
    def n_dim(self) -> int:
        return len(self.n_modes[0])

    @property
    def _extended_codim(self) -> int:
        return (
            1
            + self.static_channel_dim
            + (self.positional_encoding_dim if self.use_positional_encoding else 0)
        )

    @property
    def _hidden_codim(self) -> int:
        if self.lifting_channels is None:
            return self._extended_codim
        return self.hidden_variable_codimension

    @property
    def _end_to_end_scaling(self) -> List[float]:
        if self.per_layer_scaling_factors is None:
            return [1.0] * self.n_dim
        out = [1.0] * self.n_dim
        for s in self.per_layer_scaling_factors:
            s = [s] * self.n_dim if isinstance(s, (int, float)) else list(s)
            out = [a * b for a, b in zip(out, s)]
        return out

    @property
    def _pe_modes(self) -> Tuple[int, ...]:
        modes = (
            list(self.positional_encoding_modes)
            if self.positional_encoding_modes is not None
            else list(self.n_modes[0])
        )
        modes[-1] = modes[-1] // 2
        return tuple(max(m, 1) for m in modes)

    def setup(self):
        assert self.n_modes is not None and len(self.n_modes) == self.n_layers
        heads = self.n_heads or tuple([1] * self.n_layers)
        att_scales = self.attention_scaling_factors or tuple(
            [1.0] * self.n_layers
        )
        per_layer = self.per_layer_scaling_factors or tuple(
            [tuple([1] * self.n_dim)] * self.n_layers
        )

        if self.lifting_channels is not None:
            self.lifting = ChannelMLP(
                in_channels=self._extended_codim,
                out_channels=self._hidden_codim,
                hidden_channels=self.lifting_channels,
                n_layers=2,
                n_dim=self.n_dim,
                name="lifting",
            )
        else:
            self.lifting = None

        self.attention_layers = [
            CODALayer(
                n_modes=tuple(self.n_modes[i]),
                n_heads=heads[i],
                scale=att_scales[i],
                token_codimension=self.attention_token_dim,
                per_channel_attention=self.per_channel_attention,
                resolution_scaling_factor=(
                    per_layer[i][0]
                    if isinstance(per_layer[i], (tuple, list))
                    else per_layer[i]
                ),
                nonlinear_attention=self.nonlinear_attention,
                non_linearity=self.non_linearity,
                conv_module=self.conv_module,
                enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
                name=f"attention_{i}",
            )
            for i in range(self.n_layers)
        ]

        skips_map = self.horizontal_skips_map or {}
        self.skip_map_modules = {
            str(k): ChannelMLP(
                in_channels=2 * self._hidden_codim,
                out_channels=self._hidden_codim,
                hidden_channels=2 * self._hidden_codim,
                n_layers=1,
                n_dim=self.n_dim,
                name=f"skip_map_{k}",
            )
            for k in skips_map
        }

        if self.projection_channels is not None:
            self.projection = ChannelMLP(
                in_channels=self._hidden_codim,
                out_channels=self.output_variable_codimension,
                hidden_channels=self.projection_channels,
                n_layers=2,
                n_dim=self.n_dim,
                name="projection",
            )
        else:
            self.projection = None

        if self.enable_cls_token:
            self.cls_token_storage = self.param(
                "cls_token",
                nn.initializers.normal(1.0),
                (2, self._hidden_codim, *self._pe_modes),
            )
        if self.use_positional_encoding:
            assert self.variable_ids is not None
            self.pe_storage = {
                vid: self.param(
                    f"pos_enc_{vid}",
                    nn.initializers.normal(1.0),
                    (2, self.positional_encoding_dim, *self._pe_modes),
                )
                for vid in self.variable_ids
            }

    def _irfft_param(self, storage, spatial_shape):
        spec = jax.lax.complex(storage[0], storage[1])
        pad_widths = []
        half = list(spatial_shape)
        half[-1] = half[-1] // 2 + 1
        for dim, target in zip(spec.shape[1:], half):
            pad_widths.append((0, max(target - dim, 0)))
        spec = jnp.pad(spec, [(0, 0)] + pad_widths)
        idx = [slice(None)] + [slice(0, t) for t in half]
        spec = spec[tuple(idx)]
        return jnp.fft.irfftn(
            spec, s=spatial_shape, axes=tuple(range(-self.n_dim, 0))
        )

    def _extend_variables(self, x, static_channel, input_variable_ids):
        # (b, vars, spatial) -> (b, vars, extended_codim, spatial)
        x = x[:, :, None]
        if static_channel is not None:
            sc = jnp.broadcast_to(
                static_channel[:, None],
                (x.shape[0], x.shape[1]) + static_channel.shape[1:],
            )
            x = jnp.concatenate([x, sc], axis=2)
        if self.use_positional_encoding:
            pes = jnp.stack(
                [
                    self._irfft_param(self.pe_storage[vid], x.shape[-self.n_dim:])
                    for vid in input_variable_ids
                ],
                axis=0,
            )  # (vars, pe_dim, spatial)
            pes = jnp.broadcast_to(
                pes[None], (x.shape[0],) + pes.shape
            )
            x = jnp.concatenate([x, pes], axis=2)
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        static_channel: Optional[jnp.ndarray] = None,
        input_variable_ids: Optional[List[str]] = None,
    ) -> jnp.ndarray:
        """x: (batch, num_variables, spatial...). Reference codano.py:431+."""
        batch, num_inp_var, *spatial = x.shape
        if self.static_channel_dim > 0:
            assert static_channel is not None
            assert static_channel.shape[1] == self.static_channel_dim
        if self.use_positional_encoding:
            assert input_variable_ids is not None
            assert len(input_variable_ids) == num_inp_var

        x = self._extend_variables(x, static_channel, input_variable_ids)

        if self.lifting is not None:
            x = x.reshape(batch * num_inp_var, self._extended_codim, *spatial)
            x = self.lifting(x)
        x = x.reshape(batch, num_inp_var * self._hidden_codim, *spatial)

        if self.enable_cls_token:
            cls = self._irfft_param(self.cls_token_storage, tuple(spatial))
            cls = jnp.broadcast_to(cls[None], (batch,) + cls.shape)
            x = jnp.concatenate([cls, x], axis=1)
            num_inp_var += 1

        dp = None
        if self.domain_padding is not None and self.domain_padding > 0:
            dp = DomainPadding(
                domain_padding=self.domain_padding,
                resolution_scaling_factor=self._end_to_end_scaling,
            )
            x = dp.pad(x)

        output_shape = [
            int(round(i * j))
            for i, j in zip(x.shape[-self.n_dim:], self._end_to_end_scaling)
        ]

        skips_map = self.horizontal_skips_map or {}
        skip_outputs = {}
        for i in range(self.n_layers):
            if i in skips_map:
                skip_val = skip_outputs[skips_map[i]]
                t = resample(
                    skip_val,
                    [
                        m / n
                        for m, n in zip(
                            x.shape[-self.n_dim:], skip_val.shape[-self.n_dim:]
                        )
                    ],
                    list(range(-self.n_dim, 0)),
                    output_shape=x.shape[-self.n_dim:],
                )
                h = x.reshape(
                    batch * num_inp_var, self._hidden_codim, *x.shape[-self.n_dim:]
                )
                t = t.reshape(
                    batch * num_inp_var, self._hidden_codim, *t.shape[-self.n_dim:]
                )
                h = jnp.concatenate([h, t], axis=1)
                h = self.skip_map_modules[str(i)](h)
                x = h.reshape(
                    batch, num_inp_var * self._hidden_codim, *x.shape[-self.n_dim:]
                )
            cur_shape = tuple(output_shape) if i == self.n_layers - 1 else None
            x = self.attention_layers[i](x, output_shape=cur_shape)
            if i in skips_map.values():
                skip_outputs[i] = x

        if dp is not None:
            x = dp.unpad(x)

        if self.projection is not None:
            x = x.reshape(
                batch * num_inp_var, self._hidden_codim, *x.shape[-self.n_dim:]
            )
            x = self.projection(x)
            x = x.reshape(
                batch,
                num_inp_var * self.output_variable_codimension,
                *x.shape[-self.n_dim:],
            )
        if self.enable_cls_token:
            x = x[:, self.output_variable_codimension:]
        return x


def extend_variable_ids(
    model: CODANO,
    params,
    new_variable_ids,
    rng: jax.Array,
) -> Tuple[CODANO, dict]:
    """Grow a trained CODANO to unseen PDE variables.

    Parity with reference ``_extend_positional_encoding(new_var_ids)``
    (``neuralop/models/codano.py:351-372``), which mutates the torch module
    in place. Flax params are immutable, so this is an explicit-function
    design: returns ``(new_model, new_params)`` where ``new_model`` declares
    the union variable set and ``new_params`` contains a freshly initialized
    Fourier-space positional encoding per added id — every existing
    parameter leaf is reused unchanged, so outputs for already-known
    variables are bit-identical.
    """
    assert model.use_positional_encoding and model.variable_ids is not None, (
        "extend_variable_ids requires use_positional_encoding=True"
    )
    # dedup both against the existing ids AND within new_variable_ids
    # (a repeated new id would declare the same pos_enc param twice and
    # crash flax setup with NameInUseError)
    seen = set(model.variable_ids)
    added = []
    for v in new_variable_ids:
        if v not in seen:
            seen.add(v)
            added.append(v)
    added = tuple(added)
    new_model = model.clone(
        variable_ids=tuple(model.variable_ids) + added
    )
    # unfreeze defensively: params may be a FrozenDict or plain dict
    import flax.core

    new_params = dict(flax.core.unfreeze(params))
    shape = (2, model.positional_encoding_dim, *model._pe_modes)
    init = nn.initializers.normal(1.0)
    for i, vid in enumerate(added):
        new_params[f"pos_enc_{vid}"] = init(jax.random.fold_in(rng, i), shape)
    return new_model, new_params
