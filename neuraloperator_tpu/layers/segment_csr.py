"""Grouped (CSR) segment reductions.

Equivalent of reference ``neuralop/layers/segment_csr.py`` (torch_scatter's
``segment_csr`` + python fallback). On TPU the preferred layout is the
padded-dense one (see ``neighbor_search.py``) where the reduction is a
masked sum — this module provides both that and a CSR path built on
``jax.ops.segment_sum`` for parity with reference semantics.
"""

from typing import Literal

import jax
import jax.numpy as jnp


def segment_csr(
    src: jnp.ndarray,
    indptr: jnp.ndarray,
    reduction: Literal["sum", "mean"] = "sum",
    use_scatter: bool = True,  # API parity; ignored
) -> jnp.ndarray:
    """Reduce rows of ``src`` into segments delimited by ``indptr``.

    src: (nnz, d) or (batch, nnz, d); indptr: (m+1,) (or batched).
    Returns (m, d) / (batch, m, d).
    """
    if indptr.ndim > 1:
        indptr_1d = indptr[(0,) * (indptr.ndim - 1)]
    else:
        indptr_1d = indptr
    n_segments = indptr_1d.shape[0] - 1
    nnz = src.shape[-2]
    positions = jnp.arange(nnz)
    seg_ids = jnp.searchsorted(indptr_1d[1:], positions, side="right")

    def reduce_one(s):
        total = jax.ops.segment_sum(s, seg_ids, num_segments=n_segments)
        if reduction == "mean":
            counts = indptr_1d[1:] - indptr_1d[:-1]
            total = total / jnp.maximum(counts, 1)[:, None]
        return total

    if src.ndim == 3:
        return jax.vmap(reduce_one)(src)
    return reduce_one(src)


def masked_segment_reduce(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    reduction: Literal["sum", "mean"] = "sum",
) -> jnp.ndarray:
    """Padded-dense reduction: values (..., m, k, d), mask (m, k)."""
    mask_f = mask.astype(values.dtype)[..., None]  # (m, k, 1), broadcasts
    total = jnp.sum(values * mask_f, axis=-2)  # (..., m, d)
    if reduction == "mean":
        counts = jnp.sum(mask.astype(values.dtype), axis=-1)[..., None]  # (m, 1)
        total = total / jnp.maximum(counts, 1.0)
    return total
