"""Spectral differentiation, periodic and FC-extended non-periodic.

Counterpart of reference examples/layers/plot_fourier_diff.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.losses import FourierDiff

n = 128
xs = np.linspace(0, 2 * np.pi, n, endpoint=False)

# periodic: d/dx sin = cos, exact to spectral accuracy
f = jnp.asarray(np.sin(xs), jnp.float32)[None]
fd = FourierDiff(dim=1, L=2 * np.pi)
err = np.abs(np.asarray(fd.dx(f))[0] - np.cos(xs)).max()
print(f"periodic sin': max err {err:.2e}")

# non-periodic: d/dx x^2 = 2x via Fourier continuation
xs01 = np.linspace(0, 1, n)
g = jnp.asarray(xs01 ** 2, jnp.float32)[None]
fd_fc = FourierDiff(dim=1, L=1.0, use_fc=True, fc_degree=4,
                    fc_n_additional_pts=50)
dg = np.asarray(fd_fc.dx(g))[0]
err = np.abs(dg[5:-5] - 2 * xs01[5:-5]).max()
print(f"FC-extended (x^2)': interior max err {err:.2e}")
