"""Point-axis spatial model parallelism for the GNO / point-cloud family.

The grid families shard *spatial axes* (``distributed_fft``,
``distributed_sht``); the point-cloud analogue is sharding the
*output-point axis* of a kernel integral transform: each device owns a
slice of the query points and their (padded) neighborhoods, evaluates the
kernel MLP — the hot matmul, ``(m·k, features)`` — and the masked
reduction only for its slice, while the source points/features stay
replicated (gathers read them by index, so each device's gathers are
local). No collectives are needed until a consumer wants the full point
set; XLA inserts the single all-gather at that boundary.

Because row-major flattening makes "first latent-grid axis" and "leading
point axis" the same thing, sharding a GINO's latent queries this way
lines the latent grid up with the height-sharded layout the
sharded-FFT/SHT convs use — the whole GINO forward (in-GNO -> latent FNO
-> out-GNO) then runs spatially sharded end to end.

The reference has no distributed GNO path at all (its mpu is used only
for multigrid patching, ``/root/reference/neuralop/training/patching.py:82-105``);
this module is ahead-of-reference, in the same sense as the sharded FFT.
"""

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = [
    "point_sharding",
    "shard_points",
    "shard_neighbors",
    "shard_gino_inputs",
]


def point_sharding(
    mesh: Mesh, ndim: int, point_axis: int, axis_name: str = MODEL_AXIS
) -> NamedSharding:
    """NamedSharding that splits ``point_axis`` over the model axis."""
    spec = [None] * ndim
    spec[point_axis % ndim] = axis_name
    return NamedSharding(mesh, P(*spec))


def _check_divisible(n: int, parts: int, what: str) -> None:
    if n % parts:
        raise ValueError(
            f"{what} has {n} points, not divisible by the "
            f"'{MODEL_AXIS}' axis size {parts}; pad the point set "
            f"(masked points are free) or choose a divisible count"
        )


def shard_points(
    points, mesh: Mesh, point_axis: int = -2, axis_name: str = MODEL_AXIS
):
    """Place a point array (..., n_pts, d) with the point axis sharded.

    ``point_axis`` defaults to -2 (the reference GNO layout
    ``(batch, n_pts, coord/channel)``).
    """
    n = points.shape[point_axis]
    _check_divisible(n, mesh.shape[axis_name], "point array")
    return jax.device_put(
        points, point_sharding(mesh, points.ndim, point_axis, axis_name)
    )


def shard_neighbors(
    neighbors: Dict, mesh: Mesh, axis_name: str = MODEL_AXIS
) -> Dict:
    """Shard a padded neighbor dict over its query axis (dim 0 of the
    ``(m, k)`` index/mask/norm arrays). CSR dicts are converted first
    (their ragged layout cannot be split statically)."""
    if "neighbors_row_splits" in neighbors:
        from ..layers.neighbor_search import csr_to_padded

        neighbors = csr_to_padded(neighbors)
    m = neighbors["neighbors_index"].shape[0]
    _check_divisible(m, mesh.shape[axis_name], "neighborhood query axis")
    return {
        k: jax.device_put(
            v, point_sharding(mesh, v.ndim, 0, axis_name)
        )
        for k, v in neighbors.items()
    }


def shard_gino_inputs(
    mesh: Mesh,
    latent_queries=None,
    output_queries=None,
    in_neighbors: Optional[Dict] = None,
    out_neighbors: Optional[Dict] = None,
    axis_name: str = MODEL_AXIS,
):
    """Shard a GINO call's geometry inputs for point-axis parallelism.

    * ``latent_queries`` ``(1, n1..nk, d)`` — first grid axis sharded
      (row-major flattening makes the in-GNO's query axis and the latent
      grid's height axis coincide).
    * ``output_queries`` ``(1, n_out, d)`` or a dict of such — point axis
      sharded per query set.
    * ``in_neighbors`` / ``out_neighbors`` — padded neighbor dicts,
      sharded along their query axis to match.

    Returns the inputs in the same order, device_put with shardings;
    ``None`` entries pass through. The model code itself is unchanged —
    under ``jit`` XLA propagates these shardings through gather, kernel
    MLP, reduction, and projection.
    """
    out = []
    if latent_queries is not None:
        _check_divisible(
            latent_queries.shape[1], mesh.shape[axis_name], "latent grid"
        )
        out.append(
            jax.device_put(
                latent_queries,
                point_sharding(mesh, latent_queries.ndim, 1, axis_name),
            )
        )
    else:
        out.append(None)
    if output_queries is not None:
        if isinstance(output_queries, dict):
            out.append(
                {
                    k: shard_points(v, mesh, -2, axis_name)
                    for k, v in output_queries.items()
                }
            )
        else:
            out.append(shard_points(output_queries, mesh, -2, axis_name))
    else:
        out.append(None)
    for nbrs in (in_neighbors, out_neighbors):
        if nbrs is None:
            out.append(None)
        elif isinstance(nbrs, dict) and "neighbors_index" not in nbrs and \
                "neighbors_row_splits" not in nbrs:
            out.append(
                {k: shard_neighbors(v, mesh, axis_name)
                 for k, v in nbrs.items()}
            )
        else:
            out.append(shard_neighbors(nbrs, mesh, axis_name))
    return tuple(out)
