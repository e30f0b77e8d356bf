"""Fixed-radius neighbor search: host CSR vs padded TPU layout."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np
import jax.numpy as jnp

from neuraloperator_tpu.layers.neighbor_search import (
    native_neighbor_search,
    padded_neighbor_search,
)

rng = np.random.RandomState(0)
data = rng.rand(200, 3).astype(np.float32)
queries = rng.rand(50, 3).astype(np.float32)

csr = native_neighbor_search(data, queries, radius=0.25)
counts = np.diff(csr["neighbors_row_splits"])
print("CSR: total neighbors", csr["neighbors_index"].shape[0],
      "max degree", counts.max())

padded = padded_neighbor_search(
    jnp.asarray(data), jnp.asarray(queries), 0.25,
    max_neighbors=int(counts.max()),
)
print("padded:", padded["neighbors_index"].shape,
      "valid", int(padded["neighbors_mask"].sum()))
