"""Tensor-GaLore: memory-efficient AdamW via Tucker gradient projection.

Equivalent of reference ``neuralop/training/adamw.py`` +
``tensor_galore_projector.py``: gradients of large tensors are projected
onto a low-rank Tucker subspace (factors refreshed every
``update_proj_gap`` steps via HOSVD), Adam moments live in the small core
space, and updates are projected back with a scale factor.

Implemented as an optax-style GradientTransformation; the HOSVD runs on
device (batched SVDs of unfoldings), keeping the whole step jittable.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _unfold(t, mode):
    return jnp.moveaxis(t, mode, 0).reshape(t.shape[mode], -1)


def _hosvd_factors(g, ranks):
    """Leading left singular vectors of each mode unfolding."""
    factors = []
    for mode, r in enumerate(ranks):
        if r >= g.shape[mode]:
            factors.append(jnp.eye(g.shape[mode], dtype=g.dtype))
            continue
        u, _, _ = jnp.linalg.svd(_unfold(g, mode), full_matrices=False)
        factors.append(u[:, :r])
    return factors


def _project(g, factors):
    """core = g x_k U_k^T."""
    core = g
    for mode, u in enumerate(factors):
        core = jnp.moveaxis(
            jnp.tensordot(u.T, jnp.moveaxis(core, mode, 0), axes=([1], [0])),
            0,
            mode,
        )
    return core


def _unproject(core, factors):
    g = core
    for mode, u in enumerate(factors):
        g = jnp.moveaxis(
            jnp.tensordot(u, jnp.moveaxis(g, mode, 0), axes=([1], [0])), 0, mode
        )
    return g


class GaLoreLeafState(NamedTuple):
    factors: tuple
    m: jnp.ndarray
    v: jnp.ndarray


class GaLoreState(NamedTuple):
    count: jnp.ndarray
    leaves: dict


def _resolve_ranks(shape, rank) -> tuple:
    if isinstance(rank, (list, tuple)):
        return tuple(int(r) for r in rank)
    if isinstance(rank, float) and rank <= 1.0:
        return tuple(max(1, int(round(rank * s))) for s in shape)
    return tuple(min(int(rank), s) for s in shape)


def tensor_galore_adamw(
    learning_rate,
    rank=0.25,
    update_proj_gap: int = 50,
    galore_scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    min_dim_size_to_project: int = 16,
    activation_checkpoint: bool = False,  # API parity; HOSVD is cheap here
) -> optax.GradientTransformation:
    """AdamW with Tucker gradient projection for qualifying tensors.

    A leaf qualifies when ndim >= 2 (after the real-storage stacking axis)
    and all its dims are >= ``min_dim_size_to_project``.
    """

    def qualifies(p):
        return p.ndim >= 2 and min(p.shape) >= min_dim_size_to_project

    def init(params):
        def leaf_init(p):
            if not qualifies(p):
                return GaLoreLeafState(
                    factors=(),
                    m=jnp.zeros_like(p),
                    v=jnp.zeros_like(p),
                )
            ranks = _resolve_ranks(p.shape, rank)
            factors = tuple(
                jnp.zeros((s, r), p.dtype) for s, r in zip(p.shape, ranks)
            )
            core_shape = tuple(ranks)
            return GaLoreLeafState(
                factors=factors,
                m=jnp.zeros(core_shape, p.dtype),
                v=jnp.zeros(core_shape, p.dtype),
            )

        leaves = jax.tree_util.tree_map(leaf_init, params)
        return GaLoreState(count=jnp.zeros([], jnp.int32), leaves=leaves)

    def update(grads, state, params=None):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf_update(g, s, p):
            if not qualifies(g):
                m = b1 * s.m + (1 - b1) * g
                v = b2 * s.v + (1 - b2) * g ** 2
                mh = m / (1 - b1 ** count)
                vh = v / (1 - b2 ** count)
                upd = -lr * (mh / (jnp.sqrt(vh) + eps) + weight_decay * p)
                return upd, GaLoreLeafState((), m, v)

            refresh = (count - 1) % update_proj_gap == 0
            new_factors = jax.lax.cond(
                refresh,
                lambda: tuple(_hosvd_factors(g, [f.shape[1] for f in s.factors])),
                lambda: s.factors,
            )
            core = _project(g, new_factors)
            m = b1 * s.m + (1 - b1) * core
            v = b2 * s.v + (1 - b2) * core ** 2
            mh = m / (1 - b1 ** count)
            vh = v / (1 - b2 ** count)
            core_upd = mh / (jnp.sqrt(vh) + eps)
            upd = -lr * (
                galore_scale * _unproject(core_upd, new_factors)
                + weight_decay * p
            )
            return upd, GaLoreLeafState(tuple(new_factors), m, v)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.leaves)
        flat_p = (
            treedef.flatten_up_to(params)
            if params is not None
            else [jnp.zeros_like(g) for g in flat_g]
        )
        updates, new_leaves = [], []
        for g, s, p in zip(flat_g, flat_s, flat_p):
            u, ns = leaf_update(g, s, p)
            updates.append(u)
            new_leaves.append(ns)
        updates = jax.tree_util.tree_unflatten(treedef, updates)
        leaves = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return updates, GaLoreState(count=count, leaves=leaves)

    return optax.GradientTransformation(init, update)


class TensorGaLoreProjector:
    """Stateful Tucker gradient projector (reference
    tensor_galore_projector.py:66-106): refactors the functional HOSVD
    helpers into the reference's project/project_back object API.
    """

    def __init__(self, rank, update_proj_gap: int = 200, scale: float = 1.0,
                 activation_checkpointing: bool = False):
        self.rank = rank
        self.update_proj_gap = update_proj_gap
        self.scale = scale
        self.factors = None
        self._step = 0

    def project(self, grad, iter_: int = None):
        step = self._step if iter_ is None else iter_
        if self.factors is None or step % self.update_proj_gap == 0:
            ranks = _resolve_ranks(grad.shape, self.rank)
            self.factors = _hosvd_factors(grad, ranks)
        self._step = step + 1
        return _project(grad, self.factors)

    def project_back(self, core):
        assert self.factors is not None, "project() must run first"
        return _unproject(core, self.factors) * self.scale
