"""Fourier-mode weight contractions (dense and factorized).

Implements the contraction dispatch of the reference
(``/root/reference/neuralop/layers/spectral_convolution.py:21-177``):
given the truncated spectrum block ``x`` of shape ``(batch, in_ch, m1..md)``
and a (possibly factorized) complex weight, compute the per-mode channel
mixing. The dense path dispatches to the Pallas Karatsuba kernel on TPU
(``ops/pallas/spectral_contraction.py``) or to a packed einsum (the four
real products of the complex multiply stacked into one matmul); factorized
variants run as complex einsums decomposed into real MXU matmuls.
"""

import os
from typing import Dict, Optional

import jax.numpy as jnp

from ..tensor.factorized import FactorizationSpec, Params, to_tensor
from .complex_einsum import complex_einsum

_SYMS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

# Dense-contraction backend: "xla" (packed einsum), "pallas" (fused
# Karatsuba mode-tiled kernel, TPU only), or "auto": Pallas on TPU when the
# channel extents use the MXU lanes well, XLA otherwise. Measured on the
# v5e NS-128 bench: pallas+mixed 35.8 steps/s vs xla+mixed 30.3 vs
# xla+f32 27.6 — see BASELINE.md A/B table.
_CONTRACTION_BACKEND = os.environ.get(
    "NEURALOP_TPU_CONTRACTION_BACKEND", "auto"
)


def set_contraction_backend(name: str) -> None:
    """Select the dense mode-contraction backend ('xla'|'pallas'|'auto').

    The choice is read at TRACE time: call this BEFORE the first execution
    of any jitted function that should use it — already-compiled programs
    keep the backend they were traced with (XLA caches compiled
    executables; there is no portable way to invalidate them).
    """
    global _CONTRACTION_BACKEND
    if name not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown contraction backend {name!r}")
    _CONTRACTION_BACKEND = name


def get_contraction_backend() -> str:
    return _CONTRACTION_BACKEND


def _resolve_backend(x_shape=None, w_shape=None) -> str:
    """Resolve 'auto' per call site (trace-time; shapes are static).

    Pallas wins on TPU when the per-mode matmul uses the 128-wide MXU
    lanes (channels >= 32) and there are enough modes to tile; for small
    channel counts the (8, 128) register-tile padding wastes the VMEM
    streams and XLA's packed einsum is faster.
    """
    if _CONTRACTION_BACKEND != "auto":
        return _CONTRACTION_BACKEND
    import jax

    if jax.default_backend() != "tpu" or x_shape is None:
        return "xla"
    b, i = x_shape[0], x_shape[1]
    o = w_shape[1]
    n_modes = 1
    for s in x_shape[2:]:
        n_modes *= s
    if min(i, o) >= 32 and n_modes >= 256:
        return "pallas"
    return "xla"


def contract_dense(
    x,
    weight,
    separable: bool = False,
    return_parts: bool = False,
    compute_dtype=None,
):
    """x: (b, i, m...), weight: (i, o, m...) -> (b, o, m...).

    ``x`` may be a complex array or an (re, im) tuple of real arrays;
    likewise the output with ``return_parts``. Separable: weight (i, m...)
    multiplies x elementwise (reference ``_contract_dense_separable``).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls MXU-native in bf16 with
    f32 accumulation (``preferred_element_type``): half the HBM operand
    traffic and 2x MXU rate vs f32, at bf16 mantissa precision.

    The non-separable path packs the four real products of the complex
    multiply into ONE einsum by stacking (re, im) on the batch dim of x and
    on the out-channel dim of the weight: the (large) weight is streamed
    from HBM once instead of four times, and the per-mode matmul gets 2x
    the rows — both wins on the bandwidth-bound MXU hot path.
    """
    import jax

    from .complex_einsum import split_complex

    if separable:
        xr, xi = split_complex(x)
        wr, wi = split_complex(weight)
        wr, wi = wr[None], wi[None]
        out = (xr * wr - xi * wi, xr * wi + xi * wr)
        out = (out[0].astype(jnp.float32), out[1].astype(jnp.float32))
        if return_parts:
            return out
        return jax.lax.complex(*out)

    xr, xi = split_complex(x)
    wr, wi = split_complex(weight)
    if compute_dtype is not None:
        xr, xi = xr.astype(compute_dtype), xi.astype(compute_dtype)
        wr, wi = wr.astype(compute_dtype), wi.astype(compute_dtype)

    if _resolve_backend(xr.shape, wr.shape) == "pallas":
        from .pallas.spectral_contraction import contract_dense_pallas

        out = contract_dense_pallas((xr, xi), (wr, wi))
        if return_parts:
            return out
        return jax.lax.complex(*out)

    order = xr.ndim
    x_syms = _SYMS[:order]  # b, i, modes...
    out_sym = _SYMS[order]
    weight_syms = x_syms[1] + out_sym + x_syms[2:]
    out_syms = x_syms[0] + out_sym + x_syms[2:]

    b = xr.shape[0]
    o = wr.shape[1]
    x2 = jnp.concatenate([xr, xi], axis=0)          # (2b, i, m...)
    w2 = jnp.concatenate([wr, wi], axis=1)          # (i, 2o, m...)
    prod = jnp.einsum(
        f"{x_syms},{weight_syms}->{out_syms}",
        x2,
        w2,
        preferred_element_type=jnp.float32,
    )
    rr = prod[:b, :o]    # xr . wr
    ri = prod[:b, o:]    # xr . wi
    ir = prod[b:, :o]    # xi . wr
    ii = prod[b:, o:]    # xi . wi
    out = (rr - ii, ri + ir)
    if return_parts:
        return out
    return jax.lax.complex(*out)


def contract_cp(
    x, params: Params, spec: FactorizationSpec, separable: bool = False,
    return_parts: bool = False, compute_dtype=None,
):
    """CP contraction: rank-summed product of per-dim factors.

    Mirrors reference ``_contract_cp`` (spectral_convolution.py:55-73).
    """
    from .complex_einsum import split_complex

    order = split_complex(x)[0].ndim
    x_syms = _SYMS[:order]
    rank_sym = _SYMS[order]
    out_sym = _SYMS[order + 1]
    factors = [params[f"factor_{i}"] for i in range(spec.order)]
    if separable:
        out_syms = x_syms
        factor_syms = [x_syms[1] + rank_sym]  # in-channel factor only
    else:
        out_syms = x_syms[0] + out_sym + x_syms[2:]
        factor_syms = [x_syms[1] + rank_sym, out_sym + rank_sym]
    factor_syms += [s + rank_sym for s in x_syms[2:]]
    eq = f"{x_syms},{rank_sym},{','.join(factor_syms)}->{out_syms}"
    return complex_einsum(
        eq, x, params["lambdas"], *factors, return_parts=return_parts,
        compute_dtype=compute_dtype,
    )


def contract_tucker(
    x, params: Params, spec: FactorizationSpec, separable: bool = False,
    return_parts: bool = False, compute_dtype=None,
):
    """Tucker contraction: core tensor with per-dim factor matrices.

    Mirrors reference ``_contract_tucker`` (spectral_convolution.py:76-103).
    """
    from .complex_einsum import split_complex

    order = split_complex(x)[0].ndim
    x_syms = _SYMS[:order]
    out_sym = _SYMS[order]
    factors = [params[f"factor_{i}"] for i in range(spec.order)]
    if separable:
        core_syms = _SYMS[order + 1 : 2 * order]  # ndim-1 core dims
        out_syms = x_syms
        factor_syms = [xs + rs for xs, rs in zip(x_syms[1:], core_syms)]
    else:
        core_syms = _SYMS[order + 1 : 2 * order + 1]
        out_syms = x_syms[0] + out_sym + x_syms[2:]
        factor_syms = [x_syms[1] + core_syms[0], out_sym + core_syms[1]]
        factor_syms += [xs + rs for xs, rs in zip(x_syms[2:], core_syms[2:])]
    eq = f"{x_syms},{core_syms},{','.join(factor_syms)}->{out_syms}"
    return complex_einsum(
        eq, x, params["core"], *factors, return_parts=return_parts,
        compute_dtype=compute_dtype,
    )


def contract_tt(
    x, params: Params, spec: FactorizationSpec, separable: bool = False,
    return_parts: bool = False, compute_dtype=None,
):
    """Tensor-train contraction: chain of 3-way cores.

    Mirrors reference ``_contract_tt`` (spectral_convolution.py:106-132).
    """
    from .complex_einsum import split_complex

    order = split_complex(x)[0].ndim
    x_syms = _SYMS[:order]
    factors = [params[f"factor_{i}"] for i in range(spec.order)]
    if separable:
        weight_syms = list(x_syms[1:])
        out_syms = x_syms
    else:
        out_sym = _SYMS[order]
        weight_syms = [x_syms[1], out_sym] + list(x_syms[2:])
        out_syms = x_syms[0] + out_sym + x_syms[2:]
    rank_syms = _SYMS[order + 1 :]
    core_syms = [
        rank_syms[i] + s + rank_syms[i + 1] for i, s in enumerate(weight_syms)
    ]
    eq = f"{x_syms},{','.join(core_syms)}->{out_syms}"
    return complex_einsum(
        eq, x, *factors, return_parts=return_parts, compute_dtype=compute_dtype
    )


def contract_block(
    x,
    spec: FactorizationSpec,
    params: Params,
    separable: bool = False,
    implementation: str = "reconstructed",
    return_parts: bool = False,
    compute_dtype=None,
):
    """Dispatch the mode contraction (reference ``get_contract_fun``)."""
    kw = dict(
        separable=separable,
        return_parts=return_parts,
        compute_dtype=compute_dtype,
    )
    if implementation == "reconstructed" or spec.kind == "dense":
        weight = to_tensor(spec, params)
        return contract_dense(x, weight, **kw)
    if implementation != "factorized":
        raise ValueError(
            f"implementation must be 'reconstructed' or 'factorized', got {implementation}"
        )
    if spec.kind == "cp":
        return contract_cp(x, params, spec, **kw)
    if spec.kind == "tucker":
        return contract_tucker(x, params, spec, **kw)
    if spec.kind == "tt":
        return contract_tt(x, params, spec, **kw)
    raise ValueError(f"Unknown factorization kind {spec.kind}")
