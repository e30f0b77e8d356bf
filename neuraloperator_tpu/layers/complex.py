"""Complex-valued activation and module support.

Equivalent of reference ``neuralop/layers/complex.py``: split-activation
nonlinearities applied to real and imaginary parts separately, and a wrapper
that lifts a real module to complex inputs as ``f(Re x) + i f(Im x)`` with
two independent parameter sets (reference ``apply_complex``/
``ComplexValued``, complex.py:55-76).
"""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _split_apply(fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(fn(x.real), fn(x.imag))


def CGELU(x: jnp.ndarray) -> jnp.ndarray:
    """Complex GELU: exact GELU on real and imaginary parts."""
    return _split_apply(lambda v: jax.nn.gelu(v, approximate=False), x)


def ctanh(x: jnp.ndarray) -> jnp.ndarray:
    """Complex tanh applied separately to real and imaginary parts."""
    return _split_apply(jnp.tanh, x)


def cselu(x: jnp.ndarray) -> jnp.ndarray:
    return _split_apply(jax.nn.selu, x)


class ComplexValued(nn.Module):
    """Lift a real-parameter module to complex inputs.

    ``fr`` and ``fi`` are two independent copies of the wrapped module;
    output = (fr(Re) - fi(Im)) + i (fr(Im) + fi(Re)), i.e. the wrapped map
    acts as a complex-linear operator built from two real ones.
    """

    module_factory: Callable[[], nn.Module]

    @nn.compact
    def __call__(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        fr = self.module_factory()
        fi = self.module_factory()
        real = fr(x.real, *args, **kwargs) - fi(x.imag, *args, **kwargs)
        imag = fr(x.imag, *args, **kwargs) + fi(x.real, *args, **kwargs)
        return jax.lax.complex(real, imag)
