"""Fourier continuation of non-periodic signals (FC-Legendre / FC-Gram)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.layers.fourier_continuation import FCGram, FCLegendre

xs = np.linspace(0, 1, 101)
f = jnp.asarray(xs * (1 - xs) ** 2 + 0.3 * xs, jnp.float32)[None]

for name, fc in (
    ("FC-Legendre", FCLegendre(d=4, n_additional_pts=40)),
    ("FC-Gram", FCGram(d=4, n_additional_pts=40)),
):
    ext = fc.extend(f, dim=1)
    spec = np.abs(np.fft.rfft(np.asarray(ext)[0]))
    leak = spec[len(spec) // 2:].sum() / spec.sum()
    print(f"{name}: extended {f.shape[-1]} -> {ext.shape[-1]} pts, "
          f"high-mode leakage {leak:.2e}")
