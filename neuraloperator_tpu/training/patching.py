"""Multigrid domain-decomposition patching (MG-TFNO).

Equivalent of reference ``neuralop/training/patching.py``: split (b, c, h, w)
inputs into 2^levels x 2^levels circularly-padded patches stacked on the
batch dim, with coarser subsampled views concatenated as extra channels;
stitch model outputs back together.

TPU-native distribution: instead of NCCL scatter/gather over a model-parallel
process group (reference :82-142), the patch-stacked batch dim is *sharded*
over the mesh's 'model' axis with a sharding constraint — XLA partitions the
forward across devices and inserts the all-gather at stitch time. Gradient
flow through sharding is automatic (no DDP-average-undo hook needed).
"""

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel import mesh as mesh_lib


def make_patches(x: jnp.ndarray, n, p=0) -> jnp.ndarray:
    """Split into n x n circularly-padded patches stacked on the batch dim.

    (b, c, h, w) -> (b * n1 * n2, c, h/n1 + 2 p1, w/n2 + 2 p2); patch order
    is row-major within each batch element (i over height, j over width).
    1-D inputs (b, c, s) are also supported.
    """
    if isinstance(p, int):
        p = [p, p]
    if isinstance(n, int):
        n = [n, n]
    d = x.ndim - 2
    assert d in (1, 2), "only 1-D and 2-D patching supported"

    if d == 1:
        b, c, s = x.shape
        if n[-1] <= 1:
            return jnp.pad(x, [(0, 0), (0, 0), (p[-1], p[-1])], mode="wrap") \
                if p[-1] > 0 else x
        assert s % n[-1] == 0
        ps = s // n[-1]
        xp = jnp.pad(x, [(0, 0), (0, 0), (p[-1], p[-1])], mode="wrap")
        parts = [
            xp[:, :, j * ps : j * ps + ps + 2 * p[-1]] for j in range(n[-1])
        ]
        return jnp.concatenate(
            [pt[:, None] for pt in parts], axis=1
        ).reshape(b * n[-1], c, ps + 2 * p[-1])

    b, c, h, w = x.shape
    if n[0] <= 1 and n[1] <= 1:
        if p[0] > 0 or p[1] > 0:
            return jnp.pad(
                x, [(0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])], mode="wrap"
            )
        return x
    assert h % n[0] == 0 and w % n[1] == 0
    ph, pw = h // n[0], w // n[1]
    xp = jnp.pad(x, [(0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])], mode="wrap")
    rows = []
    for i in range(n[0]):
        for j in range(n[1]):
            rows.append(
                xp[
                    :,
                    :,
                    i * ph : i * ph + ph + 2 * p[0],
                    j * pw : j * pw + pw + 2 * p[1],
                ]
            )
    stacked = jnp.stack(rows, axis=1)  # (b, n1*n2, c, hp, wp)
    return stacked.reshape(b * n[0] * n[1], c, ph + 2 * p[0], pw + 2 * p[1])


class MultigridPatching2D:
    """See reference MultigridPatching2D (training/patching.py:13-308)."""

    def __init__(
        self,
        model=None,
        levels: int = 0,
        padding_fraction: Union[float, Tuple[float, float]] = 0,
        use_distributed: bool = False,
        stitching: bool = True,
        mesh=None,
    ):
        self.levels = levels
        if isinstance(padding_fraction, (int, float)):
            padding_fraction = [padding_fraction, padding_fraction]
        self.padding_fraction = list(padding_fraction)
        self.n_patches = [2 ** levels, 2 ** levels]
        self.use_distributed = use_distributed
        self.stitching = stitching
        self.mesh = mesh or (mesh_lib.get_mesh() if use_distributed else None)
        self.padding_height = 0
        self.padding_width = 0

    # ------------------------------------------------------------------ #
    def _shard_patches(self, x):
        """Shard the patch-stacked batch dim over the 'model' mesh axis."""
        if not self.use_distributed or self.mesh is None:
            return x
        spec = P(("data", "model"), *([None] * (x.ndim - 1)))
        sharding = NamedSharding(self.mesh, spec)
        try:
            return jax.lax.with_sharding_constraint(x, sharding)
        except ValueError:
            return jax.device_put(x, sharding)

    def patch(self, x: jnp.ndarray, y: jnp.ndarray):
        if not self.stitching:
            y = make_patches(y, n=self.n_patches[0], p=0)
        y = self._shard_patches(y) if not self.stitching else y
        x = self._make_mg_patches(x)
        x = self._shard_patches(x)
        return x, y

    def unpatch(self, x: jnp.ndarray, y: jnp.ndarray, evaluation: bool = False):
        if self.padding_height > 0 or self.padding_width > 0:
            x = self._unpad(x)
        # distributed gather happens implicitly: stitching reads all patches,
        # XLA inserts the all-gather across the 'model' axis
        if self.stitching or evaluation:
            x = self._stitch(x)
        if evaluation and not self.stitching:
            y = self._stitch(y)
        return x, y

    def _stitch(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 4, "only 2-D stitching supported"
        n1, n2 = self.n_patches
        if n1 <= 1 and n2 <= 1:
            return x
        bp, c, hp, wp = x.shape
        b = bp // (n1 * n2)
        x = x.reshape(b, n1, n2, c, hp, wp)
        x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
        return x.reshape(b, c, n1 * hp, n2 * wp)

    def _make_mg_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        levels = self.levels
        if levels <= 0:
            return x
        _, _, height, width = x.shape
        padding = [
            int(round(height * self.padding_fraction[0])),
            int(round(width * self.padding_fraction[1])),
        ]
        self.padding_height, self.padding_width = padding

        patched = make_patches(x, n=2 ** levels, p=padding)
        s1 = patched.shape[-2] - 2 * padding[0]
        s2 = patched.shape[-1] - 2 * padding[1]

        for level in range(1, levels + 1):
            sub = 2 ** level
            s1_stride = s1 // sub
            s2_stride = s2 // sub
            x_sub = x[:, :, ::sub, ::sub]

            s2_pad = (
                math.ceil((s2 + (2 ** levels - 1) * s2_stride - x_sub.shape[-1]) / 2)
                + padding[1]
            )
            s1_pad = (
                math.ceil((s1 + (2 ** levels - 1) * s1_stride - x_sub.shape[-2]) / 2)
                + padding[0]
            )

            x_sub = _circular_pad(x_sub, s1_pad, s2_pad)

            # extract one coarse window per patch, same order as make_patches
            n = 2 ** levels
            windows = []
            for i in range(n):
                for j in range(n):
                    windows.append(
                        x_sub[
                            :,
                            :,
                            i * s1_stride : i * s1_stride + s1 + 2 * padding[0],
                            j * s2_stride : j * s2_stride + s2 + 2 * padding[1],
                        ]
                    )
            coarse = jnp.stack(windows, axis=1).reshape(
                patched.shape[0], x.shape[1], s1 + 2 * padding[0], s2 + 2 * padding[1]
            )
            patched = jnp.concatenate([patched, coarse], axis=1)
        return patched

    def _unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[
            ...,
            self.padding_height : x.shape[-2] - self.padding_height,
            self.padding_width : x.shape[-1] - self.padding_width,
        ]


def _circular_pad(x, p1, p2):
    """Circular pad that supports pad sizes larger than the input size."""
    while p2 > 0:
        step = min(p2, x.shape[-1])
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (step, step)], mode="wrap")
        p2 -= step
    while p1 > 0:
        step = min(p1, x.shape[-2])
        x = jnp.pad(x, [(0, 0), (0, 0), (step, step), (0, 0)], mode="wrap")
        p1 -= step
    return x
