"""Spectral resampling of grid functions.

Counterpart of reference examples/layers/plot_resample.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.layers.resample import resample

n = 32
xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
f = jnp.asarray(np.sin(xs)[None, None, :, None] *
                np.cos(xs)[None, None, None, :], jnp.float32)

up = resample(f, 2.0, axis=[2, 3])
down = resample(up, 0.5, axis=[2, 3])
print("up:", f.shape, "->", up.shape)
print("round-trip max err:", float(jnp.abs(down - f).max()))
