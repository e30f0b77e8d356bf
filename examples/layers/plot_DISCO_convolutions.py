"""Discrete-continuous (DISCO) convolutions on equidistant grids.

Counterpart of reference examples/layers/plot_DISCO_convolutions.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp

from neuraloperator_tpu.layers.discrete_continuous_convolution import (
    EquidistantDiscreteContinuousConv2d,
    equidistant_filter_basis,
    num_basis_functions,
)

for basis, ks in (("piecewise_linear", (2, 4)), ("morlet", (2, 4)),
                  ("zernike", (3,))):
    psi = equidistant_filter_basis(ks, 7, basis)
    print(f"{basis}: {num_basis_functions(ks, basis)} basis fns, "
          f"filter stack {psi.shape}")

conv = EquidistantDiscreteContinuousConv2d(
    in_channels=2, out_channels=4, kernel_shape=(2, 4), kernel_size=7)
x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32))
v = conv.init(jax.random.PRNGKey(1), x)
print("conv:", x.shape, "->", conv.apply(v, x).shape)
