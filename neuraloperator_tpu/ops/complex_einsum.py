"""Complex einsum lowered to real MXU matmuls.

The TPU backend does not implement complex ``dot_general`` (and XLA's
decomposition of complex matmuls is not wired up on all PJRT plugins), so
every complex contraction in the framework goes through this module: the
einsum is planned as a chain of pairwise contractions (``np.einsum_path``)
and each pairwise step is executed as four real einsums

    Cr = Ar Br - Ai Bi,   Ci = Ar Bi + Ai Br

which XLA maps directly onto the MXU. This is also the right call
performance-wise: explicit real arithmetic lets the compiler fuse and tile
without complex-type constraints.
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pair_output_subscript(
    sub_a: str, sub_b: str, remaining: Sequence[str], final_out: str
) -> str:
    """Indices surviving a pairwise contraction: those still needed later."""
    needed = set(final_out)
    for s in remaining:
        needed |= set(s)
    combined = []
    for ch in dict.fromkeys(sub_a + sub_b):  # stable order
        if ch in needed:
            combined.append(ch)
    return "".join(combined)


def _pairwise_complex(eq: str, a, b, compute_dtype=None):
    """(ar, ai), (br, bi) -> (cr, ci) via THREE real einsums (Karatsuba).

        rr = Ar Br;  ii = Ai Bi;  s = (Ar+Ai)(Br+Bi)
        Cr = rr - ii;  Ci = s - rr - ii

    One fewer MXU pass than the textbook four-product form — a ~25% FLOP
    cut on contraction-bound chains (the factorized TFNO path) for two
    extra elementwise adds, which XLA fuses. The same trick powers the
    Pallas dense kernel (``ops/pallas/spectral_contraction.py``).

    With ``compute_dtype=bfloat16`` the operands are cast down for the
    matmuls (MXU-native rate) while accumulation stays f32 via
    ``preferred_element_type``.
    """
    ar, ai = a
    br, bi = b
    if compute_dtype is not None:
        ar, ai = ar.astype(compute_dtype), ai.astype(compute_dtype)
        br, bi = br.astype(compute_dtype), bi.astype(compute_dtype)
    kw = dict(preferred_element_type=jnp.float32)
    rr = jnp.einsum(eq, ar, br, **kw)
    ii = jnp.einsum(eq, ai, bi, **kw)
    s = jnp.einsum(eq, ar + ai, br + bi, **kw)
    return rr - ii, s - rr - ii


def _single_complex(eq: str, a):
    ar, ai = a
    return jnp.einsum(eq, ar), jnp.einsum(eq, ai)


def split_complex(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if isinstance(x, tuple):
        return x
    if jnp.iscomplexobj(x):
        return jnp.real(x), jnp.imag(x)
    return x, jnp.zeros_like(x)


def complex_einsum(
    eq: str, *ops, return_parts: bool = False, compute_dtype=None
):
    """Evaluate a complex einsum without complex dot_general.

    Operands may be complex arrays, real arrays, or ``(re, im)`` tuples of
    real arrays; with ``return_parts=True`` the result is an ``(re, im)``
    tuple (keeping the whole pipeline complex-dtype-free). The contraction
    order comes from ``np.einsum_path`` on the static shapes.
    ``compute_dtype`` selects the matmul operand precision (accumulation
    stays f32); intermediates and outputs are f32.
    """
    inputs, output = eq.replace(" ", "").split("->")
    subs: List[str] = inputs.split(",")
    assert len(subs) == len(ops)

    parts = [split_complex(op) for op in ops]

    def finish(r, i):
        return (r, i) if return_parts else jax.lax.complex(r, i)

    if len(ops) == 1:
        r, i = _single_complex(f"{subs[0]}->{output}", parts[0])
        return finish(r, i)

    def plan_shape(shape):
        # under jax.export shape-polymorphism a dim may be a symbolic
        # _DimExpr; any stand-in size gives a valid contraction order
        return tuple(
            d if isinstance(d, (int, np.integer)) else 8 for d in shape
        )

    dummies = [
        np.broadcast_to(np.float32(0), plan_shape(p[0].shape)) for p in parts
    ]
    path, _ = np.einsum_path(eq, *dummies, optimize="optimal")
    path = path[1:]  # first entry is the string 'einsum_path'

    work_subs = list(subs)
    work_ops = list(parts)
    for step in path:
        idxs = sorted(step, reverse=True)
        if len(idxs) == 1:
            # single-tensor step (trace/sum); run on parts directly
            i = idxs[0]
            sub = work_subs.pop(i)
            op = work_ops.pop(i)
            out_sub = _pair_output_subscript(sub, "", work_subs, output)
            r, im = _single_complex(f"{sub}->{out_sub}", op)
            work_subs.append(out_sub)
            work_ops.append((r, im))
            continue
        # contract pairs left-to-right within the step
        step_subs = [work_subs[i] for i in idxs][::-1]
        step_ops = [work_ops[i] for i in idxs][::-1]
        for i in idxs:
            work_subs.pop(i)
            work_ops.pop(i)
        cur_sub, cur_op = step_subs[0], step_ops[0]
        for k, (nxt_sub, nxt_op) in enumerate(zip(step_subs[1:], step_ops[1:])):
            pending = step_subs[k + 2 :]  # step operands not yet contracted
            out_sub = _pair_output_subscript(
                cur_sub, nxt_sub, list(work_subs) + pending, output
            )
            cur_op = _pairwise_complex(
                f"{cur_sub},{nxt_sub}->{out_sub}", cur_op, nxt_op,
                compute_dtype=compute_dtype,
            )
            cur_sub = out_sub
        work_subs.append(cur_sub)
        work_ops.append(cur_op)

    assert len(work_ops) == 1
    final_sub = work_subs[0]
    r, im = work_ops[0]
    if final_sub != output:
        r, im = _single_complex(f"{final_sub}->{output}", (r, im))
    return finish(r, im)
