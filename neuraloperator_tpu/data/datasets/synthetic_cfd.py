"""Synthetic car-CFD-style dataset: smooth 3-D bodies + surface pressure.

The reference's full car-CFD dataset (reference
``neuralop/data/datasets/car_cfd_dataset.py:11-100``) needs a network
download; only the 3-sample ``mini_car.pt`` ships in-repo — too small to
train the GNO family to convergence. This module generates an unlimited
hermetic stand-in with the SAME sample schema (vertices, vertex_normals,
press, query_points, distance, closest_points), so
GINO/FNOGNO/OTNO train on it unchanged:

- **Geometry**: deformed ellipsoids. Unit directions from a Fibonacci
  sphere; radius field rho(u) = 1 + sum_k c_k B_k(u) over low-order
  harmonic polynomials (smooth, random per sample); anisotropic scaling
  (elongated x — car-like aspect).
- **Normals**: exact-to-1e-6 central differences of the body's implicit
  function G(p) = |S^-1 p| - rho(dir(S^-1 p)).
- **Pressure**: potential-flow proxy. For a sphere in uniform flow the
  surface speed is (3/2) V sin(theta), giving cp = 1 - 9/4 sin^2(theta);
  here theta is the angle between the surface normal and the freestream,
  modulated by the local radius — a smooth, geometry-determined field the
  operator must infer from the point cloud.
- **SDF grid**: signed min-distance from a padded bounding-box grid to the
  vertex cloud (sign from G), plus the closest surface point.

Everything is float32 numpy on the host (runs once per dataset).
"""

import math
from typing import List, Optional

import numpy as np

_FREESTREAM = np.array([1.0, 0.0, 0.0], np.float64)

# smooth low-order harmonic polynomial basis on the unit sphere
_BASIS = [
    lambda u: u[..., 0],
    lambda u: u[..., 1],
    lambda u: u[..., 2],
    lambda u: u[..., 0] * u[..., 1],
    lambda u: u[..., 0] * u[..., 2],
    lambda u: u[..., 1] * u[..., 2],
    lambda u: u[..., 0] ** 2 - u[..., 1] ** 2,
    lambda u: 3.0 * u[..., 2] ** 2 - 1.0,
    lambda u: u[..., 0] * (u[..., 0] ** 2 - 3 * u[..., 1] ** 2),
    lambda u: u[..., 2] * (5.0 * u[..., 2] ** 2 - 3.0),
]


def _fibonacci_sphere(n: int) -> np.ndarray:
    """n near-uniform unit directions."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = math.pi * (3.0 - math.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.clip(1.0 - z * z, 0.0, None))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def _rho(u: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Radius field on unit directions."""
    out = np.ones(u.shape[:-1])
    for c, b in zip(coeffs, _BASIS):
        out = out + c * b(u)
    return np.clip(out, 0.35, None)


def _implicit(p: np.ndarray, inv_scale: np.ndarray, coeffs: np.ndarray):
    """G(p) < 0 inside, = 0 on the surface."""
    q = p * inv_scale
    r = np.linalg.norm(q, axis=-1)
    u = q / np.clip(r[..., None], 1e-12, None)
    return r - _rho(u, coeffs)


def _normals(p, inv_scale, coeffs, h=1e-4):
    g = np.zeros_like(p)
    for a in range(3):
        dp = np.zeros(3)
        dp[a] = h
        g[..., a] = (
            _implicit(p + dp, inv_scale, coeffs)
            - _implicit(p - dp, inv_scale, coeffs)
        ) / (2 * h)
    return g / np.clip(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12, None)


def generate_cfd_sample(
    rng: np.random.Generator,
    n_verts: int = 2048,
    grid_n: int = 16,
    deform: float = 0.08,
) -> dict:
    u = _fibonacci_sphere(n_verts)
    coeffs = rng.normal(0.0, deform, len(_BASIS))
    scale = np.array(
        [rng.uniform(1.6, 2.2), rng.uniform(0.7, 1.0), rng.uniform(0.6, 0.9)]
    )
    inv_scale = 1.0 / scale
    verts = (_rho(u, coeffs)[..., None] * u) * scale
    normals = _normals(verts, inv_scale, coeffs)

    # potential-flow proxy pressure: cp = 1 - 9/4 sin^2(theta_n), modulated
    # by local radius (relative to mean) so the field depends on the full
    # geometry, not the normal alone
    cos_t = normals @ _FREESTREAM
    sin2 = 1.0 - cos_t**2
    local_r = np.linalg.norm(verts, axis=-1)
    mod = local_r / local_r.mean()
    press = (1.0 - 2.25 * sin2 * mod).astype(np.float32)

    # padded bounding-box query grid + signed distance + closest points
    lo = verts.min(0) - 0.15
    hi = verts.max(0) + 0.15
    axes = [np.linspace(lo[a], hi[a], grid_n) for a in range(3)]
    qp = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    flat = qp.reshape(-1, 3)
    d2 = ((flat[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    dist = np.sqrt(d2[np.arange(len(flat)), nearest])
    sign = np.sign(_implicit(flat, inv_scale, coeffs))
    sdf = (sign * dist).reshape(grid_n, grid_n, grid_n, 1)
    closest = verts[nearest].reshape(grid_n, grid_n, grid_n, 3)

    return {
        "vertices": verts.astype(np.float32),
        "vertex_normals": normals.astype(np.float32),
        "press": press[None].astype(np.float32),  # (1, n_verts)
        "query_points": qp.astype(np.float32),
        "distance": sdf.astype(np.float32),
        "closest_points": closest.astype(np.float32),
    }


def load_synthetic_cfd(
    n_samples: int,
    n_verts: int = 2048,
    grid_n: int = 16,
    seed: int = 0,
    cache: Optional[str] = None,
) -> List[dict]:
    """Generate (or load cached) synthetic car-CFD-style samples.

    Same schema as ``load_mini_car``; pass ``cache`` to memoize on disk.
    """
    if cache is not None:
        from pathlib import Path

        path = Path(cache)
        if path.exists():
            with np.load(path, allow_pickle=True) as z:
                samples = list(z["samples"])
            if len(samples) >= n_samples:
                return samples[:n_samples]
    rng = np.random.default_rng(seed)
    samples = [
        generate_cfd_sample(rng, n_verts=n_verts, grid_n=grid_n)
        for _ in range(n_samples)
    ]
    if cache is not None:
        np.savez_compressed(
            cache, samples=np.asarray(samples, dtype=object)
        )
    return samples
