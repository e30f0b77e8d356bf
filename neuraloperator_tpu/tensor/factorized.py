"""Factorized complex weight tensors (Dense / CP / Tucker / TT).

JAX-native replacement for the reference's tltorch ``FactorizedTensor``
dependency (used in ``/root/reference/neuralop/layers/
spectral_convolution.py:362-370``). A factorized weight is represented as a
plain dict of complex arrays (a flax-params-friendly pytree) plus a static
:class:`FactorizationSpec` describing the layout. Contraction with these
factors is lowered as batched complex einsums, which XLA decomposes into
real matmuls on the MXU.

Rank semantics follow tensorly's fraction-of-parameters convention: a float
``rank`` r means "use ~r × the dense parameter count".
"""

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.complex_einsum import complex_einsum

Array = jnp.ndarray
Params = Dict[str, Array]

_VALID_KINDS = ("dense", "cp", "tucker", "tt")


@dataclass(frozen=True)
class FactorizationSpec:
    """Static description of a factorized weight tensor."""

    kind: str
    shape: Tuple[int, ...]
    ranks: Tuple[int, ...] = ()  # meaning depends on kind

    @property
    def order(self) -> int:
        return len(self.shape)


def _dense_params(shape) -> int:
    return int(np.prod(shape))


def resolve_spec(
    factorization: Optional[str],
    shape: Sequence[int],
    rank=1.0,
    fixed_rank_modes: Optional[Sequence[int]] = None,
) -> FactorizationSpec:
    """Resolve a (possibly fractional) rank into integer factor ranks."""
    shape = tuple(int(s) for s in shape)
    kind = (factorization or "dense").lower()
    if kind not in _VALID_KINDS:
        raise ValueError(
            f"Unknown factorization {factorization!r}; expected one of {_VALID_KINDS}"
        )
    if kind == "dense":
        return FactorizationSpec("dense", shape)

    if kind == "cp":
        if isinstance(rank, float) and rank <= 1.0:
            # tensorly validate_cp_rank: params = rank * sum(shape) (+rank)
            r = max(1, int(round(rank * _dense_params(shape) / sum(shape))))
        else:
            r = int(rank)
        return FactorizationSpec("cp", shape, (r,))

    if kind == "tucker":
        fixed = set(fixed_rank_modes or ())
        if isinstance(rank, (float, int)) and not isinstance(rank, bool) and float(rank) <= 1.0:
            target = float(rank) * _dense_params(shape)

            def params_for(t: float) -> Tuple[int, ...]:
                return tuple(
                    s if i in fixed else max(1, int(round(t * s)))
                    for i, s in enumerate(shape)
                )

            lo, hi = 1e-3, 1.0
            for _ in range(40):
                mid = 0.5 * (lo + hi)
                ranks = params_for(mid)
                n = int(np.prod(ranks)) + sum(
                    r * s for r, s in zip(ranks, shape)
                )
                if n > target:
                    hi = mid
                else:
                    lo = mid
            ranks = params_for(lo)
        elif isinstance(rank, (list, tuple)):
            ranks = tuple(int(r) for r in rank)
        else:
            ranks = tuple(
                s if i in fixed else int(rank) for i, s in enumerate(shape)
            )
        return FactorizationSpec("tucker", shape, ranks)

    # tt: internal bond ranks r_1..r_{L-1} (r_0 = r_L = 1 implicit)
    L = len(shape)
    if isinstance(rank, float) and rank <= 1.0:
        target = rank * _dense_params(shape)

        def tt_params(r: int) -> int:
            ranks_full = [1] + [r] * (L - 1) + [1]
            return sum(
                ranks_full[i] * shape[i] * ranks_full[i + 1] for i in range(L)
            )

        r = 1
        while tt_params(r + 1) <= target and r < max(shape) * 4:
            r += 1
        bond = tuple([r] * (L - 1))
    elif isinstance(rank, (list, tuple)):
        bond = tuple(int(x) for x in rank)
    else:
        bond = tuple([int(rank)] * (L - 1))
    return FactorizationSpec("tt", shape, bond)


def factor_shapes(spec: FactorizationSpec) -> Dict[str, Tuple[int, ...]]:
    """Shapes of each parameter array for a given spec."""
    if spec.kind == "dense":
        return {"weight": spec.shape}
    if spec.kind == "cp":
        (r,) = spec.ranks
        out = {"lambdas": (r,)}
        for i, s in enumerate(spec.shape):
            out[f"factor_{i}"] = (s, r)
        return out
    if spec.kind == "tucker":
        out = {"core": tuple(spec.ranks)}
        for i, (s, r) in enumerate(zip(spec.shape, spec.ranks)):
            out[f"factor_{i}"] = (s, r)
        return out
    # tt
    ranks_full = (1,) + spec.ranks + (1,)
    return {
        f"factor_{i}": (ranks_full[i], s, ranks_full[i + 1])
        for i, s in enumerate(spec.shape)
    }


def n_params(spec: FactorizationSpec) -> int:
    """Real parameter count (complex entries count twice)."""
    return 2 * sum(int(np.prod(s)) for s in factor_shapes(spec).values())


def init_factors(
    key: jax.Array, spec: FactorizationSpec, std: float, dtype=jnp.complex64
) -> Params:
    """Random init such that the reconstructed tensor has scale ~``std``.

    The reconstructed entry is a sum over ``R`` products of ``T`` independent
    factor entries; choosing per-factor std ``(std^2 / R)^(1/(2T))`` gives the
    reconstruction variance ``std^2``.
    """
    shapes = factor_shapes(spec)
    T = len(shapes)
    if spec.kind == "dense":
        R = 1
    elif spec.kind == "cp":
        R = spec.ranks[0] ** 1  # one rank index contracted across all factors
    elif spec.kind == "tucker":
        R = int(np.prod(spec.ranks))
    else:  # tt
        R = int(np.prod(spec.ranks)) if spec.ranks else 1
    sigma = (std ** 2 / max(R, 1)) ** (1.0 / (2 * T))

    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for k, (name, shp) in zip(keys, shapes.items()):
        kr, ki = jax.random.split(k)
        real = jax.random.normal(kr, shp) * (sigma / math.sqrt(2))
        imag = jax.random.normal(ki, shp) * (sigma / math.sqrt(2))
        params[name] = (real + 1j * imag).astype(dtype)
    return params


def to_tensor(spec: FactorizationSpec, params: Params) -> Array:
    """Reconstruct the full (dense) weight tensor from its factors."""
    if spec.kind == "dense":
        return params["weight"]
    if spec.kind == "cp":
        factors = [params[f"factor_{i}"] for i in range(spec.order)]
        syms = _symbols(spec.order)
        eq = (
            "r,"
            + ",".join(f"{s}r" for s in syms)
            + "->"
            + "".join(syms)
        )
        return complex_einsum(eq, params["lambdas"], *factors)
    if spec.kind == "tucker":
        factors = [params[f"factor_{i}"] for i in range(spec.order)]
        syms = _symbols(spec.order)
        rsyms = _symbols(spec.order, offset=spec.order)
        eq = (
            "".join(rsyms)
            + ","
            + ",".join(f"{s}{r}" for s, r in zip(syms, rsyms))
            + "->"
            + "".join(syms)
        )
        return complex_einsum(eq, params["core"], *factors)
    # tt: chain of pairwise bond contractions, done as real einsums
    syms = _symbols(spec.order)
    rank_syms = _symbols(spec.order + 1, offset=spec.order)
    core_syms = [rank_syms[i] + syms[i] + rank_syms[i + 1] for i in range(spec.order)]
    eq = ",".join(core_syms) + "->" + rank_syms[0] + "".join(syms) + rank_syms[-1]
    full = complex_einsum(eq, *[params[f"factor_{i}"] for i in range(spec.order)])
    return full.squeeze(0).squeeze(-1)


def slice_factors(
    spec: FactorizationSpec, params: Params, slices: Sequence[slice]
) -> Tuple[FactorizationSpec, Params]:
    """Slice the weight tensor along its dims, staying in factorized form.

    ``slices`` has one entry per tensor dim. Needed for incremental-FNO-style
    dynamic mode truncation (reference ``spectral_convolution.py:489``) where
    the active modes sit at the center of the stored weight tensor.
    """
    slices = tuple(slices)
    assert len(slices) == spec.order
    new_shape = tuple(
        len(range(*sl.indices(s))) for sl, s in zip(slices, spec.shape)
    )
    if spec.kind == "dense":
        return (
            FactorizationSpec("dense", new_shape),
            {"weight": params["weight"][slices]},
        )
    out: Params = {}
    if spec.kind == "cp":
        out["lambdas"] = params["lambdas"]
        for i, sl in enumerate(slices):
            out[f"factor_{i}"] = params[f"factor_{i}"][sl]
        return FactorizationSpec("cp", new_shape, spec.ranks), out
    if spec.kind == "tucker":
        out["core"] = params["core"]
        for i, sl in enumerate(slices):
            out[f"factor_{i}"] = params[f"factor_{i}"][sl]
        return FactorizationSpec("tucker", new_shape, spec.ranks), out
    for i, sl in enumerate(slices):
        out[f"factor_{i}"] = params[f"factor_{i}"][:, sl, :]
    return FactorizationSpec("tt", new_shape, spec.ranks), out


def _symbols(n: int, offset: int = 0) -> str:
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return alphabet[offset : offset + n]
