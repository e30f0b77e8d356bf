"""Mollifier weighting functions for mollified GNO layers.

Equivalent of reference ``neuralop/layers/gno_weighting_functions.py:5-93``:
smooth cutoff functions of the *squared* distance, scaled so the weight
vanishes at the search radius.
"""

import jax.numpy as jnp


def bump(sq_dist, radius: float, scale: float = 1.0):
    """Classic bump function exp(1 - 1/(1 - r^2/R^2)), zero outside."""
    r2 = sq_dist / (radius ** 2)
    inside = r2 < 1.0
    safe = jnp.where(inside, r2, 0.0)
    w = jnp.exp(1.0 - 1.0 / jnp.maximum(1.0 - safe, 1e-12))
    return scale * jnp.where(inside, w, 0.0)


def half_cos(sq_dist, radius: float, scale: float = 1.0):
    r = jnp.sqrt(jnp.maximum(sq_dist, 0.0)) / radius
    return scale * jnp.where(r < 1.0, jnp.cos(0.5 * jnp.pi * r), 0.0)


def quadr(sq_dist, radius: float, scale: float = 1.0):
    r2 = sq_dist / (radius ** 2)
    return scale * jnp.where(r2 < 1.0, 1.0 - r2, 0.0)


def quartic(sq_dist, radius: float, scale: float = 1.0):
    r2 = sq_dist / (radius ** 2)
    return scale * jnp.where(r2 < 1.0, (1.0 - r2) ** 2, 0.0)


def octic(sq_dist, radius: float, scale: float = 1.0):
    r2 = sq_dist / (radius ** 2)
    return scale * jnp.where(r2 < 1.0, (1.0 - r2) ** 4, 0.0)


_WEIGHTING_FNS = {
    "bump": bump,
    "half_cos": half_cos,
    "quadr": quadr,
    "quartic": quartic,
    "octic": octic,
}


def dispatch_weighting_fn(name: str, sq_radius: float, scale: float = 1.0):
    """Return w(sq_dist) for the named mollifier (reference :70-93)."""
    try:
        fn = _WEIGHTING_FNS[name]
    except KeyError:
        raise ValueError(
            f"unknown weighting fn {name!r}; expected one of {sorted(_WEIGHTING_FNS)}"
        )
    radius = float(sq_radius) ** 0.5

    def weight(sq_dist):
        return fn(sq_dist, radius=radius, scale=scale)

    return weight


# Reference-named aliases (gno_weighting_functions.py:5-93)
bump_cutoff = bump
half_cos_cutoff = half_cos
quadr_cutoff = quadr
quartic_cutoff = quartic
octic_cutoff = octic
