"""Pointwise channel MLPs.

Equivalent of reference ``neuralop/layers/channel_mlp.py``: an MLP applied
along the channel dim at every spatial location. On TPU a kernel-size-1 conv
is just a matmul over flattened spatial positions, so we express each layer
as a single einsum the XLA compiler maps directly onto the MXU.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu(x):
    """Exact (erf) GELU, matching torch.nn.functional.gelu's default."""
    return jax.nn.gelu(x, approximate=False)


class ChannelMLP(nn.Module):
    """Channels-first pointwise MLP: (b, c, d1..dN) -> (b, out, d1..dN).

    Mirrors reference ``ChannelMLP`` (channel_mlp.py:6-119).
    """

    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    n_layers: int = 2
    n_dim: int = 2  # unused; kept for API parity
    non_linearity: Callable = gelu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        hid_ch = self.hidden_channels or self.in_channels

        dims = []
        for i in range(self.n_layers):
            d_in = self.in_channels if i == 0 else hid_ch
            d_out = out_ch if i == self.n_layers - 1 else hid_ch
            dims.append((d_in, d_out))

        spatial = x.shape[2:]
        h = x.reshape(x.shape[0], x.shape[1], -1)  # (b, c, s)
        for i, (d_in, d_out) in enumerate(dims):
            w = self.param(
                f"w{i}",
                nn.initializers.lecun_normal(),
                (d_out, d_in),
            )
            b = self.param(f"b{i}", nn.initializers.zeros, (d_out,))
            h = jnp.einsum("oc,bcs->bos", w, h) + b[None, :, None]
            if i < self.n_layers - 1:
                h = self.non_linearity(h)
            if self.dropout > 0.0:
                h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h.reshape(x.shape[0], out_ch, *spatial)


class LinearChannelMLP(nn.Module):
    """Channels-last MLP over point features: (..., c_in) -> (..., c_out).

    Mirrors reference ``LinearChannelMLP`` (channel_mlp.py:122-187), used as
    the kernel network of graph/integral-transform layers.
    """

    layers: Sequence[int]
    non_linearity: Callable = gelu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n_layers = len(self.layers) - 1
        assert n_layers >= 1, "LinearChannelMLP needs at least two layer sizes"
        for i in range(n_layers):
            x = nn.Dense(self.layers[i + 1], name=f"fc{i}")(x)
            if i < n_layers - 1:
                x = self.non_linearity(x)
            if self.dropout > 0.0:
                x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x
