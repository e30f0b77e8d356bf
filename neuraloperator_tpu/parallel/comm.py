"""mpu-parity accessors and in-shard collectives.

API counterpart of the reference's ``neuralop/mpu`` package:

* ``comm.py:41-198`` accessors (``get_world_size``, per-axis sizes/ranks,
  ``init``) — here answered from the active ``jax.sharding.Mesh`` and
  the JAX process topology.
* ``mappings.py:34-117`` autograd-transparent collectives (``copy_to`` /
  ``reduce_from`` / ``scatter_to`` / ``gather_from`` the model-parallel
  region) — here thin wrappers over ``jax.lax`` collectives with custom
  VJPs, valid *inside* ``shard_map`` over the model axis. Under plain
  ``pjit`` these are unnecessary (sharding annotations subsume them);
  they exist for explicitly-scheduled shard_map kernels like the
  distributed FFT. Note: when returning an all-gathered value as
  replicated (``out_specs=P()``-style), pass ``check_vma=False`` to
  ``jax.shard_map`` — JAX's static replication checker cannot infer
  that the gather output is identical across the model axis.
* ``helpers.py:28-77`` tensor helpers (``split_tensor_along_dim``,
  ``pad_helper``, ``truncate_helper``, ``get_memory_format``).

All accessors degrade gracefully to single-process / no-mesh, exactly as
the reference's do.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    get_data_parallel_size,
    get_mesh,
    get_model_parallel_size,
    init,  # noqa: F401  (reference name: comm.init)
)

# ---------------------------------------------------------------------------
# accessors (reference mpu/comm.py:41-101)
# ---------------------------------------------------------------------------


def get_world_size() -> int:
    mesh = get_mesh()
    if mesh is not None:
        return mesh.devices.size
    return jax.device_count()


def get_local_rank() -> int:
    """Process-local rank (reference reads LOCAL_RANK; here the JAX
    process index — one process drives all local chips)."""
    return jax.process_index()


def get_global_rank() -> int:
    return jax.process_index()


def get_data_parallel_group():
    """The data axis of the active mesh (stands in for the NCCL group)."""
    return DATA_AXIS if get_mesh() is not None else None


def get_model_parallel_group():
    return MODEL_AXIS if get_mesh() is not None else None


def get_data_parallel_rank(axis_env: bool = True) -> int:
    """Inside shard_map: this shard's index on the data axis. Outside a
    mapped context, 0 (single controller drives all shards)."""
    try:
        return int(jax.lax.axis_index(DATA_AXIS))
    except NameError:
        return 0
    except Exception:
        return 0


def get_model_parallel_rank() -> int:
    try:
        return int(jax.lax.axis_index(MODEL_AXIS))
    except Exception:
        return 0


# ---------------------------------------------------------------------------
# autograd-transparent collectives (reference mpu/mappings.py:34-117)
# valid inside shard_map over the model axis
# ---------------------------------------------------------------------------


@jax.custom_vjp
def copy_to_model_parallel_region(x):
    """Identity forward / all-reduce backward (mappings.py:34-53)."""
    return x


def _copy_fwd(x):
    return x, None


def _copy_bwd(_, g):
    return (jax.lax.psum(g, MODEL_AXIS),)


copy_to_model_parallel_region.defvjp(_copy_fwd, _copy_bwd)


@jax.custom_vjp
def reduce_from_model_parallel_region(x):
    """All-reduce forward / identity backward (mappings.py:55-72)."""
    return jax.lax.psum(x, MODEL_AXIS)


def _reduce_fwd(x):
    return jax.lax.psum(x, MODEL_AXIS), None


def _reduce_bwd(_, g):
    return (g,)


reduce_from_model_parallel_region.defvjp(_reduce_fwd, _reduce_bwd)


def scatter_to_model_parallel_region(x, dim: int = -1):
    """Keep this shard's slice of ``dim`` forward; all-gather backward
    (mappings.py:74-95). Implemented as a dynamic slice by axis index —
    the VJP of a slice is a scatter, and psum-of-scatters = all-gather."""
    size = jax.lax.psum(1, MODEL_AXIS)
    idx = jax.lax.axis_index(MODEL_AXIS)
    dim = dim % x.ndim
    chunk = x.shape[dim] // size
    start = [0] * x.ndim
    start[dim] = idx * chunk
    sizes = list(x.shape)
    sizes[dim] = chunk
    out = jax.lax.dynamic_slice(x, start, sizes)
    # match torch's averaged-loss convention: gradient flows only into the
    # owned slice; combined with DDP-style psum this reconstructs the full
    # gradient (the reference rescales in patching.py:76-80)
    return out


def gather_from_model_parallel_region(x, dim: int = -1):
    """All-gather forward / split backward (mappings.py:97-117)."""
    dim = dim % x.ndim
    return jax.lax.all_gather(x, MODEL_AXIS, axis=dim, tiled=True)


# ---------------------------------------------------------------------------
# tensor helpers (reference mpu/helpers.py:21-77)
# ---------------------------------------------------------------------------


def get_memory_format(x) -> str:
    """JAX arrays are always dense row-major; kept for API parity."""
    return "contiguous"


def split_tensor_along_dim(x, dim: int, num_chunks: int):
    """Split into equal chunks along ``dim`` (helpers.py:66-77)."""
    if x.shape[dim] % num_chunks != 0:
        raise ValueError(
            f"dim {dim} of size {x.shape[dim]} not divisible into "
            f"{num_chunks} chunks"
        )
    return jnp.split(x, num_chunks, axis=dim)


def pad_helper(x, dim: int, new_size: int, mode: str = "zero"):
    """Pad ``dim`` up to ``new_size`` (helpers.py:28-50).

    ``mode='conj'`` mirrors the reference's conjugate-symmetric padding
    used to extend rfft half-spectra to full spectra.
    """
    dim = dim % x.ndim
    ndim_pad = new_size - x.shape[dim]
    if ndim_pad < 0:
        raise ValueError("new_size smaller than current size")
    if ndim_pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[dim] = (0, ndim_pad)
    out = jnp.pad(x, pads)
    if mode == "conj":
        # fill the padded tail with the reversed conjugate of the
        # interior modes (Hermitian extension of an rfft half-spectrum)
        idx_src = [slice(None)] * x.ndim
        idx_src[dim] = slice(1, ndim_pad + 1)
        idx_dst = [slice(None)] * x.ndim
        idx_dst[dim] = slice(x.shape[dim], new_size)
        src = jnp.flip(jnp.conj(out[tuple(idx_src)]), axis=dim)
        out = out.at[tuple(idx_dst)].set(src)
    return out


def truncate_helper(x, dim: int, new_size: int):
    """Truncate ``dim`` down to ``new_size`` (helpers.py:53-63)."""
    dim = dim % x.ndim
    idx = [slice(None)] * x.ndim
    idx[dim] = slice(0, new_size)
    return x[tuple(idx)]
