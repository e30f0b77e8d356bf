"""Fixed-radius neighbor search.

Equivalent of reference ``neuralop/layers/neighbor_search.py`` (open3d
FixedRadiusSearch + native fallback), redesigned for XLA's static-shape
requirement:

* :func:`native_neighbor_search` — host (numpy) search returning the
  reference's CSR dict. Used for preprocessing and API parity.
* :func:`padded_neighbor_search` — jit-friendly search returning a padded
  dense neighbor list ``(m, max_neighbors)`` plus a mask. All downstream
  gathers/reductions become static-shape ops (the TPU-native layout).
* :func:`csr_to_padded` — convert host CSR output to the padded layout.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def native_neighbor_search(data, queries, radius: float, return_norm: bool = False):
    """Host search -> CSR dict (reference neighbor_search.py:84-119).

    Fast path: the C++ grid-hash kernel in ``neuraloperator_tpu.native``
    (O(n + m·k), multithreaded) — the stand-in for the reference's open3d
    CUDA FixedRadiusSearch. Falls back to the O(n·m) numpy search when the
    native library is unavailable; both orderings are identical.
    """
    data = np.asarray(data)
    queries = np.asarray(queries)

    from ..native import fixed_radius_search_cpp

    if data.ndim == 2 and queries.ndim == 2:
        native = fixed_radius_search_cpp(data, queries, radius)
        if native is not None:
            index, splits = native
            out = {
                "neighbors_index": index,
                "neighbors_row_splits": splits,
            }
            if return_norm:
                counts = splits[1:] - splits[:-1]
                query_of = np.repeat(
                    np.arange(len(queries), dtype=np.int64), counts
                )
                diff = queries[query_of] - data[index]
                out["neighbors_norm"] = (diff ** 2).sum(-1)
            return out

    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    within = d2 <= radius ** 2
    counts = within.sum(axis=1)
    splits = np.zeros(len(queries) + 1, dtype=np.int64)
    np.cumsum(counts, out=splits[1:])
    index = np.nonzero(within)[1].astype(np.int64)
    out = {
        "neighbors_index": index,
        "neighbors_row_splits": splits,
    }
    if return_norm:
        out["neighbors_norm"] = d2[within]
    return out


def csr_to_padded(neighbors: Dict, max_neighbors: Optional[int] = None) -> Dict:
    """CSR dict -> padded {'neighbors_index' (m,k), 'neighbors_mask' (m,k)}."""
    index = np.asarray(neighbors["neighbors_index"])
    splits = np.asarray(neighbors["neighbors_row_splits"])
    counts = splits[1:] - splits[:-1]
    m = len(counts)
    k = int(max_neighbors if max_neighbors is not None else max(counts.max(), 1))
    padded = np.zeros((m, k), dtype=np.int64)
    mask = np.zeros((m, k), dtype=bool)
    for i in range(m):
        c = min(int(counts[i]), k)
        padded[i, :c] = index[splits[i] : splits[i] + c]
        mask[i, :c] = True
    out = {
        "neighbors_index": jnp.asarray(padded),
        "neighbors_mask": jnp.asarray(mask),
    }
    if "neighbors_norm" in neighbors:
        norm = np.zeros((m, k), dtype=np.float32)
        nrm = np.asarray(neighbors["neighbors_norm"])
        for i in range(m):
            c = min(int(counts[i]), k)
            norm[i, :c] = nrm[splits[i] : splits[i] + c]
        out["neighbors_norm"] = jnp.asarray(norm)
    return out


def padded_neighbor_search(
    data: jnp.ndarray,
    queries: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    return_norm: bool = False,
) -> Dict:
    """Static-shape radius search inside jit.

    Computes the (m, n) squared-distance matrix (one MXU matmul), masks by
    radius, and keeps up to ``max_neighbors`` nearest candidates per query
    via top-k. For point clouds that fit in memory this is faster on TPU
    than any tree/hash structure — it is pure matmul + top-k.
    """
    # |q - p|^2 = |q|^2 + |p|^2 - 2 q.p  (matmul-dominated)
    qn = jnp.sum(queries ** 2, axis=-1, keepdims=True)
    pn = jnp.sum(data ** 2, axis=-1)[None, :]
    d2 = qn + pn - 2.0 * (queries @ data.T)
    d2 = jnp.maximum(d2, 0.0)
    within = d2 <= radius ** 2
    # rank by distance, invalid -> +inf
    ranked = jnp.where(within, d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-ranked, max_neighbors)
    mask = jnp.isfinite(-neg_top)
    out = {
        "neighbors_index": idx,
        "neighbors_mask": mask,
    }
    if return_norm:
        out["neighbors_norm"] = jnp.where(mask, -neg_top, 0.0)
    return out


class NeighborSearch:
    """Callable wrapper mirroring the reference module interface.

    ``mode='padded'`` (default, TPU path) returns the padded layout;
    ``mode='csr'`` runs the host search and returns the reference CSR dict.
    """

    def __init__(
        self,
        use_open3d: bool = False,  # accepted for API parity; ignored
        return_norm: bool = False,
        mode: str = "padded",
        max_neighbors: Optional[int] = None,
    ):
        self.return_norm = return_norm
        self.mode = mode
        self.max_neighbors = max_neighbors

    def __call__(self, data, queries, radius: float) -> Dict:
        if self.mode == "csr":
            return native_neighbor_search(
                data, queries, radius, return_norm=self.return_norm
            )
        if self.max_neighbors is not None:
            return padded_neighbor_search(
                jnp.asarray(data),
                jnp.asarray(queries),
                radius,
                self.max_neighbors,
                return_norm=self.return_norm,
            )
        # unknown budget: host search, then pad to the actual max degree
        csr = native_neighbor_search(
            np.asarray(data), np.asarray(queries), radius,
            return_norm=self.return_norm,
        )
        return csr_to_padded(csr)
