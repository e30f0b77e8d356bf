"""Zarr-backed PDE dataset (lazy chunked reads).

Counterpart of reference ``neuralop/data/datasets/zarr_dataset.py``: a
map-style dataset over a zarr array store with resolution subsampling and
optional per-field transforms. ``zarr`` is an optional dependency — the
class raises a clear ImportError at construction if it is unavailable
(the reference raises at import time; we gate at use so the package
imports cleanly without zarr).
"""

from typing import Optional

import numpy as np

try:  # optional dependency
    import zarr  # type: ignore

    _HAS_ZARR = True
except Exception:  # pragma: no cover - zarr not shipped in this image
    zarr = None
    _HAS_ZARR = False


class ZarrDataset:
    """Lazy dataset over a zarr store holding 'x' and 'y' arrays.

    Matches reference zarr_dataset.py:12-100: resolution ∈ {128, 256, 512,
    1024} maps to a spatial subsample step relative to the stored 1024
    grid; samples are returned as dict batches ``{'x': ..., 'y': ...}``.
    """

    _RESOLUTION_TO_STEP = {128: 8, 256: 4, 512: 2, 1024: 1}

    def __init__(
        self,
        filename,
        resolution: int = 128,
        transform_x=None,
        transform_y=None,
        n_samples: Optional[int] = None,
    ):
        if not _HAS_ZARR:
            raise ImportError(
                "ZarrDataset requires the optional dependency `zarr`, which "
                "is not installed in this environment."
            )
        try:
            self.subsample_step = self._RESOLUTION_TO_STEP[resolution]
        except KeyError:
            raise ValueError(
                f"Got resolution={resolution}, expected one of "
                f"{sorted(self._RESOLUTION_TO_STEP)}"
            )
        self.filename = str(filename)
        self.transform_x = transform_x
        self.transform_y = transform_y
        self._data = None
        if n_samples is not None:
            self.n_samples = n_samples
        else:
            data = zarr.open(self.filename, mode="r")
            self.n_samples = data.shape[0]
            del data

    @property
    def data(self):
        if self._data is None:
            self._data = zarr.open(self.filename, mode="r")
        return self._data

    def attrs(self, array_name: str, name: str):
        return self.data[array_name].attrs[name]

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, idx):
        if isinstance(idx, int):
            if idx >= self.n_samples:
                raise IndexError(
                    f"sample {idx} out of range for dataset of "
                    f"{self.n_samples} samples"
                )
        step = self.subsample_step
        x = np.asarray(self.data["x"][idx, ::step, ::step], dtype=np.float32)
        y = np.asarray(self.data["y"][idx, ::step, ::step], dtype=np.float32)
        x = x[None]  # add channel dim
        y = y[None]
        if self.transform_x is not None:
            x = self.transform_x(x)
        if self.transform_y is not None:
            y = self.transform_y(y)
        return {"x": x, "y": y}
