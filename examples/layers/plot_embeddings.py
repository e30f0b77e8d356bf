"""Positional embeddings: grid coordinates and sinusoidal features.

Counterpart of reference examples/layers/plot_embeddings.py and
plot_sinusoidal_embeddings.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp

from neuraloperator_tpu.layers.embeddings import (
    GridEmbedding2D,
    GridEmbeddingND,
    SinusoidalEmbedding,
)

x = jnp.ones((2, 3, 16, 16))
grid2d = GridEmbedding2D(in_channels=3)
print("GridEmbedding2D:", x.shape, "->", grid2d(x).shape)  # +2 coord channels

x3 = jnp.ones((2, 3, 8, 8, 8))
gridnd = GridEmbeddingND(in_channels=3, dim=3)
print("GridEmbeddingND(3):", x3.shape, "->", gridnd(x3).shape)

coords = jnp.linspace(0, 1, 10)[:, None]
for style in ("transformer", "nerf"):
    emb = SinusoidalEmbedding(in_channels=1, num_frequencies=4,
                              embedding_type=style)
    print(f"Sinusoidal[{style}]:", coords.shape, "->", emb(coords).shape)
