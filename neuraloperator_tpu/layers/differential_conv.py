"""Finite-difference convolution (directional-derivative stencil).

Equivalent of reference ``neuralop/layers/differential_conv.py``: a local
convolution minus its own kernel-sum (zero-mean stencil), divided by the
grid width — converges to a directional derivative under refinement
(Liu-Schiaffini et al., ICML 2024).
"""

from typing import Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


def _pad_spatial(x: jnp.ndarray, pad: int, n_dim: int, mode: str) -> jnp.ndarray:
    cfg = [(0, 0), (0, 0)] + [(pad, pad)] * n_dim
    if mode == "periodic":
        return jnp.pad(x, cfg, mode="wrap")
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "zeros":
        return jnp.pad(x, cfg)
    raise NotImplementedError(f"padding mode {mode!r} not supported")


class FiniteDifferenceConvolution(nn.Module):
    """See reference FiniteDifferenceConvolution (differential_conv.py:6-101)."""

    in_channels: int
    out_channels: int
    n_dim: int
    kernel_size: int = 3
    groups: int = 1
    padding: str = "periodic"

    @nn.compact
    def __call__(self, x: jnp.ndarray, grid_width: float) -> jnp.ndarray:
        assert self.kernel_size % 2 == 1, "kernel size must be odd"
        k = (self.kernel_size,) * self.n_dim
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.out_channels, self.in_channels // self.groups) + k,
        )
        pad = self.kernel_size // 2
        xp = _pad_spatial(x, pad, self.n_dim, self.padding)
        letters = "DHW"[-self.n_dim:]
        dn = lax.conv_dimension_numbers(
            xp.shape, w.shape, ("NC" + letters, "OI" + letters, "NC" + letters)
        )
        conv = lax.conv_general_dilated(
            xp, w, (1,) * self.n_dim, "VALID",
            dimension_numbers=dn, feature_group_count=self.groups,
        )
        # subtract the kernel-sum response: conv with the summed stencil
        w_sum = jnp.sum(w, axis=tuple(range(2, 2 + self.n_dim)), keepdims=True)
        dn1 = lax.conv_dimension_numbers(
            x.shape, w_sum.shape, ("NC" + letters, "OI" + letters, "NC" + letters)
        )
        conv_sum = lax.conv_general_dilated(
            x, w_sum, (1,) * self.n_dim, "VALID",
            dimension_numbers=dn1, feature_group_count=self.groups,
        )
        return (conv - conv_sum) / grid_width
