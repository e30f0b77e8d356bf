"""Finite-difference derivatives on regular grids.

Counterpart of reference examples/layers/plot_finite_diff.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.losses import FiniteDiff

n = 64
xs = np.linspace(0, 2 * np.pi, n, endpoint=False)
X, Y = np.meshgrid(xs, xs, indexing="ij")
f = jnp.asarray(np.sin(X) * np.cos(Y), jnp.float32)[None, None]

fd = FiniteDiff(dim=2, h=2 * np.pi / n, periodic_in_x=True,
                periodic_in_y=True)
dfdx = np.asarray(fd.dx(f))[0, 0]
err = np.abs(dfdx - np.cos(X) * np.cos(Y)).max()
print(f"d/dx max err (2nd-order central): {err:.2e}")

lap = np.asarray(fd.laplacian(f))[0, 0]
err_lap = np.abs(lap + 2 * np.sin(X) * np.cos(Y)).max()
print(f"laplacian max err: {err_lap:.2e}")
