"""Normalization layers: AdaIN, InstanceNorm, GroupNorm wrapper, BatchNorm.

Equivalent of reference ``neuralop/layers/normalization_layers.py``, in
functional JAX style: AdaIN takes its conditioning embedding as a call
argument instead of mutable module state.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """Dimension-agnostic instance norm (no affine), channels-first.

    Normalizes over spatial dims per (sample, channel); reference
    ``InstanceNorm`` (normalization_layers.py:60-97).
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class GroupNorm(nn.Module):
    """GroupNorm with learnable affine, channels-first layout."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c = x.shape[:2]
        spatial = x.shape[2:]
        g = self.num_groups
        h = x.reshape(b, g, c // g, -1)
        mean = jnp.mean(h, axis=(2, 3), keepdims=True)
        var = jnp.var(h, axis=(2, 3), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        h = h.reshape(b, c, *spatial)
        w = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        shape = (1, c) + (1,) * len(spatial)
        return h * w.reshape(shape) + bias.reshape(shape)


class AdaIN(nn.Module):
    """Adaptive instance norm conditioned on an embedding vector.

    Instance-normalizes, then applies per-channel scale/shift produced by an
    MLP on the embedding (reference ``AdaIN``, normalization_layers.py:5-57).
    The embedding is passed at call time (functional equivalent of
    ``set_embedding``).
    """

    embed_dim: int
    in_channels: int
    mlp_hidden: int = 512
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        emb = embedding.reshape(self.embed_dim)
        h = nn.Dense(self.mlp_hidden, name="mlp0")(emb)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(2 * self.in_channels, name="mlp1")(h)
        weight, bias = h[: self.in_channels], h[self.in_channels :]

        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + self.eps)
        shape = (1, self.in_channels) + (1,) * (x.ndim - 2)
        return xhat * weight.reshape(shape) + bias.reshape(shape)


class BatchNorm(nn.Module):
    """Batch norm over (batch, *spatial) per channel, channels-first.

    Reference ``BatchNorm`` (normalization_layers.py:99-165). Running stats
    are tracked in the 'batch_stats' collection (flax convention).
    """

    n_dim: int
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features)
        )
        axes = (0,) + tuple(range(2, x.ndim))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
        shape = (1, self.num_features) + (1,) * (x.ndim - 2)
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        xhat = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        return xhat * scale.reshape(shape) + bias.reshape(shape)
