"""Divergence-free spectral projection (Helmholtz–Hodge).

Equivalent of reference ``neuralop/layers/spectral_projection.py:6-102``:
project a vector field onto its divergence-free part in truncated Fourier
space, u_hat := u_hat - k (k . u_hat) / |k|^2 — a hard incompressibility
constraint. 2-D implementation on (batch, 2, h, w) fields.

Complex arithmetic is purely elementwise, so this runs on restricted TPU
runtimes as-is.
"""

import jax
import jax.numpy as jnp
import numpy as np


def spectral_projection_divergence_free(
    u: jnp.ndarray, periodic: bool = True
) -> jnp.ndarray:
    """u: (batch, 2, h, w) velocity field -> div-free projection."""
    b, c, h, w = u.shape
    assert c == 2, "expects a 2-component velocity field"
    uh = jnp.fft.rfftn(u, axes=(-2, -1), norm="forward")
    kx = jnp.asarray(np.fft.fftfreq(h, d=1.0 / h), jnp.float32)
    ky = jnp.asarray(np.fft.rfftfreq(w, d=1.0 / w), jnp.float32)
    KX = kx[:, None]
    KY = ky[None, :]
    k2 = KX ** 2 + KY ** 2
    k2 = jnp.where(k2 == 0, 1.0, k2)
    div = KX * uh[:, 0] + KY * uh[:, 1]  # (b, h, w//2+1), complex
    proj0 = uh[:, 0] - KX * div / k2
    proj1 = uh[:, 1] - KY * div / k2
    proj = jnp.stack([proj0, proj1], axis=1)
    # Nyquist modes carry no direction information and break Hermitian
    # symmetry after projection — zero them (hard constraint stays exact)
    nyq = (jnp.abs(KX) == h // 2) | (KY == w // 2)
    proj = jnp.where(nyq[None, None], 0.0 + 0.0j, proj)
    out = jnp.fft.irfftn(proj, s=(h, w), axes=(-2, -1), norm="forward")
    return out
