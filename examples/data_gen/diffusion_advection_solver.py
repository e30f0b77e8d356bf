"""Spectral solver for 2-D diffusion-advection.

Counterpart of reference examples/data_gen/plot_diffusion_advection_solver.py:
u_t + c . grad(u) = nu lap(u), solved exactly per Fourier mode.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

n, nu = 64, 1e-2
c = (1.0, 0.5)
rng = np.random.default_rng(0)

# random band-limited initial condition
k = np.fft.fftfreq(n, d=1.0 / n)
KX, KY = np.meshgrid(k, k, indexing="ij")
amp = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
amp *= (np.sqrt(KX ** 2 + KY ** 2) <= 8)
u0 = np.fft.ifft2(amp).real
u0 /= np.abs(u0).max()

# exact semi-group step in Fourier space:
# u_hat(t) = u_hat(0) * exp(-(i c.k + nu |k|^2) t)
def step(u, t):
    u_hat = np.fft.fft2(u)
    sym = 1j * (c[0] * KX + c[1] * KY) * (2 * np.pi) \
        + nu * ((2 * np.pi) ** 2) * (KX ** 2 + KY ** 2)
    return np.fft.ifft2(u_hat * np.exp(-sym * t)).real

for t in (0.0, 0.05, 0.2):
    ut = step(u0, t)
    print(f"t={t}: energy {float((ut ** 2).mean()):.4f}, "
          f"max {float(np.abs(ut).max()):.3f}")
