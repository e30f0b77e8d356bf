"""Positional embeddings: coordinate grids, sinusoidal, rotary.

Equivalent of reference ``neuralop/layers/embeddings.py``. Grids are built
at trace time with static shapes, so XLA constant-folds them — no runtime
cache needed (the reference caches per-resolution tensors on the module).
"""

import math
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def regular_grid_nd(
    resolutions: Sequence[int], grid_boundaries: Sequence[Sequence[float]]
) -> List[jnp.ndarray]:
    """Meshgrid of normalized coordinates (reference embeddings.py:361-387)."""
    assert len(resolutions) == len(grid_boundaries)
    axes = [
        np.linspace(lo, hi, n + 1)[:-1].astype(np.float32)
        for n, (lo, hi) in zip(resolutions, grid_boundaries)
    ]
    grids = np.meshgrid(*axes, indexing="ij")
    return [jnp.asarray(g) for g in grids]


def regular_grid_2d(
    spatial_dims: Sequence[int], grid_boundaries=((0.0, 1.0), (0.0, 1.0))
):
    gx, gy = regular_grid_nd(spatial_dims, grid_boundaries)
    return gx, gy


class GridEmbeddingND:
    """Append N normalized coordinate channels to (b, c, d1..dN) inputs.

    Mirrors reference ``GridEmbeddingND`` (embeddings.py:90-164). Stateless:
    the grid is a trace-time constant.
    """

    def __init__(self, in_channels: int, dim: int = 2, grid_boundaries=None):
        self.in_channels = in_channels
        self.dim = dim
        if grid_boundaries is None:
            grid_boundaries = [[0.0, 1.0]] * dim
        assert len(grid_boundaries) == dim
        self.grid_boundaries = grid_boundaries

    @property
    def out_channels(self):
        return self.in_channels + self.dim

    def __call__(self, data: jnp.ndarray, batched: bool = True) -> jnp.ndarray:
        if not batched and data.ndim == self.dim + 1:
            data = data[None]
        batch = data.shape[0]
        grids = regular_grid_nd(data.shape[2:], self.grid_boundaries)
        chans = [
            jnp.broadcast_to(g[None, None], (batch, 1) + g.shape).astype(data.dtype)
            for g in grids
        ]
        return jnp.concatenate([data, *chans], axis=1)


class GridEmbedding2D(GridEmbeddingND):
    """2-D special case (reference embeddings.py:18-87)."""

    def __init__(self, in_channels: int, grid_boundaries=((0, 1), (0, 1))):
        super().__init__(in_channels, dim=2, grid_boundaries=list(grid_boundaries))


class SinusoidalEmbedding:
    """Sinusoidal coordinate embedding, 'transformer' or 'nerf' styles.

    Mirrors reference ``SinusoidalEmbedding`` (embeddings.py:167-295):
    maps (..., in_channels) coordinates to (..., in_channels * num_freqs * 2).
    """

    def __init__(
        self,
        in_channels: int,
        num_frequencies: Optional[int] = None,
        embedding_type: str = "transformer",
        max_positions: int = 10000,
    ):
        self.in_channels = in_channels
        self.num_frequencies = num_frequencies
        self.embedding_type = embedding_type
        self.max_positions = max_positions

    @property
    def out_channels(self):
        return 2 * self.in_channels * (self.num_frequencies or 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        unbatched = x.ndim == 2
        if unbatched:
            x = x[None]
        b, n, c = x.shape
        if self.embedding_type == "nerf":
            freqs = (2.0 ** jnp.arange(self.num_frequencies)) * math.pi
        elif self.embedding_type == "transformer":
            k = jnp.arange(self.num_frequencies)
            freqs = 1.0 / (self.max_positions ** (2 * k / (2 * self.num_frequencies)))
        else:
            raise ValueError(
                f"embedding_type must be 'transformer' or 'nerf', got {self.embedding_type}"
            )
        # (b, n, c, f)
        ang = x[..., None] * freqs[None, None, None, :]
        emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = emb.reshape(b, n, -1)
        return emb[0] if unbatched else emb


def rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


class RotaryEmbedding2D:
    """2-D rotary embedding for attention-kernel integral layers.

    Mirrors reference ``RotaryEmbedding2D`` (embeddings.py:296-332).
    """

    def __init__(self, dim: int, min_freq: float = 1.0 / 64.0, scale: float = 1.0):
        self.dim = dim
        self.min_freq = min_freq
        self.scale = scale
        self.inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2).astype(np.float32) / dim))

    def __call__(self, coordinates: jnp.ndarray) -> jnp.ndarray:
        t = coordinates / self.min_freq * self.scale
        freqs = jnp.einsum("...i,j->...ij", t, jnp.asarray(self.inv_freq))
        return jnp.concatenate([freqs, freqs], axis=-1)

    @staticmethod
    def apply_1d_rotary_pos_emb(t, freqs):
        return t * jnp.cos(freqs) + rotate_half(t) * jnp.sin(freqs)

    @staticmethod
    def apply_2d_rotary_pos_emb(t, freqs_x, freqs_y):
        d = t.shape[-1]
        t_x, t_y = t[..., : d // 2], t[..., d // 2 :]
        return jnp.concatenate(
            [
                RotaryEmbedding2D.apply_1d_rotary_pos_emb(t_x, freqs_x),
                RotaryEmbedding2D.apply_1d_rotary_pos_emb(t_y, freqs_y),
            ],
            axis=-1,
        )


def apply_rotary_pos_emb(t, freqs):
    """Rotate features by position frequencies (reference
    embeddings.py: apply_rotary_pos_emb, used with RotaryEmbedding2D)."""
    return t * jnp.cos(freqs) + rotate_half(t) * jnp.sin(freqs)
