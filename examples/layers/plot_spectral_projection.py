"""Divergence-free spectral projection (Helmholtz-Hodge).

Counterpart of reference examples/layers/plot_spectral_projection.py:
project a velocity field onto its divergence-free part,
u_hat -> u_hat - k (k . u_hat)/|k|^2, and verify k . u_hat = 0.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.layers.spectral_projection import (
    spectral_projection_divergence_free,
)

n = 64
rng = np.random.RandomState(0)
u = jnp.asarray(rng.randn(1, 2, n, n), jnp.float32)
u_df = spectral_projection_divergence_free(u)


def spectral_div(v):
    vh = jnp.fft.rfftn(v, axes=(-2, -1), norm="forward")
    kx = jnp.asarray(np.fft.fftfreq(n, d=1.0 / n))[:, None]
    ky = jnp.asarray(np.fft.rfftfreq(n, d=1.0 / n))[None, :]
    return float(jnp.abs(kx * vh[:, 0] + ky * vh[:, 1]).mean())


print(f"mean |k . u_hat| before: {spectral_div(u):.3f}, "
      f"after projection: {spectral_div(u_df):.2e}")
print("field changed by:",
      round(float(jnp.abs(u - u_df).mean() / jnp.abs(u).mean()), 3))
