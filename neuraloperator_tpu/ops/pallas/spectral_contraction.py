"""Pallas TPU kernel: per-mode complex channel contraction.

The FNO hot inner op is ``out[b,o,m] = sum_i x[b,i,m] * w[i,o,m]`` with
complex operands — a bandwidth-bound batched matmul over thousands of small
per-mode (B x I) @ (I x O) products. This kernel:

* tiles the flattened mode axis and streams each weight tile from HBM into
  VMEM exactly once per pass,
* computes the complex product with Karatsuba's 3-multiplication scheme
  (t1 = xr wr, t2 = xi wi, t3 = (xr + xi)(wr + wi); out_r = t1 - t2,
  out_i = t3 - t1 - t2), saving 25% of MXU work vs the naive 4 products,
* runs the per-tile contraction as one batched ``dot_general`` with the
  mode tile as the batch dimension.

Inputs/outputs are split-real (re, im) pairs of float32 arrays with the
modes flattened onto the trailing axis.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
    # blocks: x (T, B, I), w (T, I, O), out (T, B, O)
    xr = xr_ref[:]
    xi = xi_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]

    dn = (((2,), (1,)), ((0,), (0,)))  # contract I; batch T

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32
        )

    t1 = bdot(xr, wr)
    t2 = bdot(xi, wi)
    t3 = bdot(xr + xi, wr + wi)
    or_ref[:] = t1 - t2
    oi_ref[:] = t3 - t1 - t2


@functools.partial(jax.jit, static_argnames=("tile_m",))
def pallas_mode_contraction(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    wr: jnp.ndarray,
    wi: jnp.ndarray,
    tile_m: int = 128,  # 2 w-tiles (4MB) + x/out tiles double-buffered < 16MB VMEM
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x parts: (M, B, I); w parts: (M, I, O) -> out parts (M, B, O).

    M (flattened modes) is padded to a multiple of ``tile_m`` by the caller
    or here (zero modes contribute zero outputs, which are sliced off).
    """
    M, B, I = xr.shape
    O = wr.shape[-1]
    Mp = ((M + tile_m - 1) // tile_m) * tile_m
    if Mp != M:
        pad = [(0, Mp - M), (0, 0), (0, 0)]
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
        wr, wi = jnp.pad(wr, pad), jnp.pad(wi, pad)

    grid = (Mp // tile_m,)
    x_spec = pl.BlockSpec(
        (tile_m, B, I), lambda m: (m, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (tile_m, I, O), lambda m: (m, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (tile_m, B, O), lambda m: (m, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((Mp, B, O), jnp.float32),
        jax.ShapeDtypeStruct((Mp, B, O), jnp.float32),
    ]
    o_r, o_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=[o_spec, o_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * Mp * B * I * O,
            bytes_accessed=4 * (2 * Mp * B * I + 2 * Mp * I * O + 2 * Mp * B * O),
            transcendentals=0,
        ),
    )(xr, xi, wr, wi)
    return o_r[:M], o_i[:M]


def contract_dense_pallas(x_parts, w_parts):
    """Adapter: x (re, im) of (b, i, m1..md); w (re, im) of (i, o, m1..md).

    Returns (re, im) of (b, o, m1..md). Falls back to raising on
    non-TPU-friendly shapes; callers guard with try/except or config.
    """
    xr, xi = x_parts
    wr, wi = w_parts
    b, i = xr.shape[:2]
    mode_shape = xr.shape[2:]
    o = wr.shape[1]
    M = 1
    for s in mode_shape:
        M *= s
    xr2 = jnp.moveaxis(xr.reshape(b, i, M), -1, 0)  # (M, b, i)
    xi2 = jnp.moveaxis(xi.reshape(b, i, M), -1, 0)
    wr2 = jnp.moveaxis(wr.reshape(i, o, M), -1, 0)  # (M, i, o)
    wi2 = jnp.moveaxis(wi.reshape(i, o, M), -1, 0)
    o_r, o_i = pallas_mode_contraction(xr2, xi2, wr2, wi2)
    o_r = jnp.moveaxis(o_r, 0, -1).reshape(b, o, *mode_shape)
    o_i = jnp.moveaxis(o_i, 0, -1).reshape(b, o, *mode_shape)
    return o_r, o_i
