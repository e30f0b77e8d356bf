"""Skip connections: identity, linear (pointwise conv), soft-gating.

Equivalent of reference ``neuralop/layers/skip_connections.py``. The linear
skip is a pointwise channel map — a single matmul over flattened spatial
positions, which XLA places on the MXU. Soft-gating is a learned
per-channel scale (reference ``SoftGating``, skip_connections.py:53-94).
"""

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class SoftGating(nn.Module):
    """Per-channel learnable gate: ``x * w (+ b)``; channels-first layout."""

    in_features: int
    out_features: Optional[int] = None
    n_dim: int = 2
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.out_features is not None and self.in_features != self.out_features:
            raise ValueError(
                "SoftGating requires in_features == out_features, got "
                f"{self.in_features} != {self.out_features}"
            )
        shape = (1, self.in_features) + (1,) * self.n_dim
        w = self.param("weight", nn.initializers.ones, shape)
        if self.use_bias:
            b = self.param("bias", nn.initializers.ones, shape)
            return w * x + b
        return w * x


class Flattened1dConv(nn.Module):
    """Pointwise channel projection over flattened spatial dims.

    Mirrors reference ``Flattened1dConv`` (skip_connections.py:96-130) with
    kernel_size=1 (the only configuration the reference uses for skips).
    """

    in_channels: int
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = x.shape
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.out_channels, self.in_channels),
        )
        h = x.reshape(size[0], size[1], -1)
        y = jnp.einsum("oc,bcs->bos", w, h)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None]
        return y.reshape(size[0], self.out_channels, *size[2:])


class LocalConvSkip(nn.Module):
    """Local N-D conv with kernel > 1 and 'same' padding.

    The ``conv_bias_kernel > 1`` option of reference ``_make_conv_bias``
    (fno_block.py:18-43): a local convolution alongside the global spectral
    path. Implemented channels-first via lax.conv_general_dilated.
    """

    in_channels: int
    out_channels: int
    n_dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        k = (self.kernel_size,) * self.n_dim
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.out_channels, self.in_channels) + k,
        )
        dn = lax.conv_dimension_numbers(
            x.shape,
            w.shape,
            ("NC" + "DHW"[-self.n_dim:], "OI" + "DHW"[-self.n_dim:],
             "NC" + "DHW"[-self.n_dim:]),
        )
        return lax.conv_general_dilated(
            x, w, window_strides=(1,) * self.n_dim, padding="SAME",
            dimension_numbers=dn,
        )


def skip_connection(
    in_features: int,
    out_features: int,
    n_dim: int = 2,
    use_bias: bool = False,
    skip_type: str = "soft-gating",
    name: Optional[str] = None,
) -> nn.Module:
    """Factory mirroring reference ``skip_connection`` (skip_connections.py:5-50)."""
    st = skip_type.lower()
    if st == "soft-gating":
        return SoftGating(
            in_features=in_features,
            out_features=out_features,
            n_dim=n_dim,
            use_bias=use_bias,
            name=name,
        )
    if st == "linear":
        return Flattened1dConv(
            in_channels=in_features,
            out_channels=out_features,
            use_bias=use_bias,
            name=name,
        )
    if st == "identity":
        return Identity(name=name)
    raise ValueError(
        f"Got skip_type={skip_type}, expected one of 'soft-gating', 'linear', 'identity'"
    )


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x
