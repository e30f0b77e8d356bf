"""Complex einsum utilities.

Role-equivalent of reference ``neuralop/layers/einsum_utils.py`` (complex32
einsum via the view-as-real trick): on TPU every complex contraction is
lowered to pairwise real einsums — see
:mod:`neuraloperator_tpu.ops.complex_einsum`, re-exported here under the
reference's name for API parity.
"""

from ..ops.complex_einsum import complex_einsum, split_complex  # noqa: F401


def einsum_complexhalf(eq, *ops):
    """Reduced-precision complex einsum (reference ``einsum_complexhalf``).

    Parts are rounded through bfloat16 (the TPU analogue of chalf) around a
    split-real contraction.
    """
    import jax
    import jax.numpy as jnp

    def to_half(x):
        r, i = split_complex(x)
        return (
            r.astype(jnp.bfloat16).astype(jnp.float32),
            i.astype(jnp.bfloat16).astype(jnp.float32),
        )

    halves = [to_half(op) for op in ops]
    return complex_einsum(eq, *halves)


def einsum_complexhalf_two_input(eq, a, b):
    """Two-operand fast path (reference ``einsum_complexhalf_two_input``).

    On TPU both paths lower identically (pairwise split-real einsums), so
    this simply asserts arity and delegates.
    """
    return einsum_complexhalf(eq, a, b)
