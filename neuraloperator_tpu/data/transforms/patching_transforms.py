"""Patching transforms for dataset-side multigrid decomposition.

Equivalent of reference ``neuralop/data/transforms/patching_transforms.py``:
``MGPatchingTransform`` (Transform wrapper over MultigridPatching2D),
``RandomMGPatch`` (sample one random patch per example) and
``MGPTensorDataset``.
"""

from typing import Tuple, Union

import numpy as np

from ...training.patching import MultigridPatching2D, make_patches
from ..datasets.tensor_dataset import TensorDataset
from .base_transforms import Transform


class MGPatchingTransform(Transform):
    """Transform wrapper over MG patching (reference :10)."""

    def __init__(self, levels: int = 1, padding_fraction: float = 0,
                 stitching: bool = False):
        self.patcher = MultigridPatching2D(
            levels=levels, padding_fraction=padding_fraction,
            stitching=stitching,
        )

    def transform(self, x):
        return self.patcher._make_mg_patches(x)

    def inverse_transform(self, x):
        return self.patcher._stitch(x)


class RandomMGPatch(Transform):
    """Pick one random patch (with coarse context channels) per sample
    (reference :74)."""

    def __init__(self, levels: int = 1, seed: int = 0):
        self.levels = levels
        self._rng = np.random.RandomState(seed)
        self.patcher = MultigridPatching2D(levels=levels, padding_fraction=0)

    def transform(self, sample):
        x, y = sample
        import jax.numpy as jnp

        px = self.patcher._make_mg_patches(jnp.asarray(x)[None])
        py = make_patches(jnp.asarray(y)[None], n=2 ** self.levels, p=0)
        n = px.shape[0]
        i = int(self._rng.randint(n))
        return np.asarray(px[i]), np.asarray(py[i])

    def inverse_transform(self, sample):
        raise NotImplementedError("random patch selection is not invertible")


class MGPTensorDataset(TensorDataset):
    """TensorDataset yielding random MG patches (reference :116)."""

    def __init__(self, x, y, levels: int = 1, seed: int = 0):
        super().__init__(x, y)
        self.transform = RandomMGPatch(levels=levels, seed=seed)

    def __getitem__(self, i):
        x, y = self.arrays["x"][i], self.arrays["y"][i]
        px, py = self.transform.transform((x, y))
        return {"x": px, "y": py}
