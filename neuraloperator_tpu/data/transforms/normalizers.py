"""Gaussian normalization of tensor datasets.

Equivalent of reference ``neuralop/data/transforms/normalizers.py``:
``UnitGaussianNormalizer`` with dimension-reduced statistics and streaming
``partial_fit``, plus a dict-keyed variant.
"""

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class UnitGaussianNormalizer:
    """Normalize to zero mean / unit std over the reduction dims.

    ``dim`` lists the dims reduced when computing statistics (e.g.
    ``[0, 2, 3]`` for channel-wise stats of (b, c, h, w) data). Statistics
    are numpy arrays; ``transform`` works on numpy or jnp arrays and is safe
    inside jit.
    """

    def __init__(self, mean=None, std=None, eps: float = 1e-7, dim=None):
        self.mean = None if mean is None else np.asarray(mean)
        self.std = None if std is None else np.asarray(std)
        self.eps = eps
        self.dim = list(dim) if dim is not None else None
        self.n_elements = 0

    def fit(self, data):
        self.n_elements = 0
        self.mean = None
        self.std = None
        self.partial_fit(data)
        return self

    def partial_fit(self, data, batch_size: int = 0):
        """Streaming mean/var update (reference normalizers.py:84-153)."""
        data = np.asarray(data, dtype=np.float32)
        dim = self.dim if self.dim is not None else list(range(data.ndim))
        count = int(np.prod([data.shape[d] for d in dim])) if dim else 1
        mean = data.mean(axis=tuple(dim), keepdims=True)
        var = data.var(axis=tuple(dim), keepdims=True)
        if self.n_elements == 0:
            self.mean, self._var, self.n_elements = mean, var, count
        else:
            n_a, n_b = self.n_elements, count
            mu_a, mu_b = self.mean, mean
            tot = n_a + n_b
            new_mean = (n_a * mu_a + n_b * mu_b) / tot
            new_var = (
                n_a * (self._var + (mu_a - new_mean) ** 2)
                + n_b * (var + (mu_b - new_mean) ** 2)
            ) / tot
            self.mean, self._var, self.n_elements = new_mean, new_var, tot
        self.std = np.sqrt(self._var)
        return self

    @classmethod
    def from_dataset(cls, dataset, dim=None, keys=("x", "y")):
        """Fit one normalizer per key over an iterable of dict samples."""
        normalizers = {k: cls(dim=dim) for k in keys}
        for sample in dataset:
            for k in keys:
                normalizers[k].partial_fit(np.asarray(sample[k])[None])
        return normalizers

    def transform(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def inverse_transform(self, x):
        return x * (self.std + self.eps) + self.mean

    __call__ = transform

    def state_dict(self) -> dict:
        """JSON-serializable fitted statistics (for checkpoint sidecars)."""
        return {
            "mean": None if self.mean is None else np.asarray(self.mean).tolist(),
            "std": None if self.std is None else np.asarray(self.std).tolist(),
            "eps": float(self.eps),
            "dim": self.dim,
            "n_elements": int(self.n_elements),
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "UnitGaussianNormalizer":
        norm = cls(
            mean=state.get("mean"),
            std=state.get("std"),
            eps=state.get("eps", 1e-7),
            dim=state.get("dim"),
        )
        norm.n_elements = int(state.get("n_elements", 0))
        if norm.std is not None:
            norm._var = norm.std**2
        return norm


class DictUnitGaussianNormalizer:
    """Apply per-key normalizers to dict samples (reference :205+)."""

    def __init__(self, normalizers: Dict[str, UnitGaussianNormalizer]):
        self.normalizers = normalizers

    def transform(self, d: dict) -> dict:
        return {
            k: (self.normalizers[k].transform(v) if k in self.normalizers else v)
            for k, v in d.items()
        }

    def inverse_transform(self, d: dict) -> dict:
        return {
            k: (
                self.normalizers[k].inverse_transform(v)
                if k in self.normalizers
                else v
            )
            for k, v in d.items()
        }
