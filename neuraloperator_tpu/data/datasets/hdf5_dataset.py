"""HDF5 and Zarr dataset wrappers.

Equivalent of reference ``neuralop/data/datasets/hdf5_dataset.py`` and
``zarr_dataset.py``: lazy per-sample access into large on-disk arrays,
yielding the standard {'x', 'y'} dict samples.
"""

from pathlib import Path
from typing import Optional

import numpy as np


class H5pyDataset:
    """Lazy dataset over an HDF5 file with 'x' and 'y' arrays
    (reference hdf5_dataset.py:6)."""

    def __init__(
        self,
        filename,
        resolution: Optional[int] = None,
        n_samples: Optional[int] = None,
        subsampling_rate: int = 1,
        transform_x=None,
        transform_y=None,
    ):
        import h5py

        self.path = Path(filename)
        self._file = h5py.File(self.path.as_posix(), "r")
        self.data_x = self._file["x"]
        self.data_y = self._file["y"]
        self.subsampling_rate = subsampling_rate or 1
        self.n_samples = (
            n_samples if n_samples is not None else self.data_x.shape[0]
        )
        self.transform_x = transform_x
        self.transform_y = transform_y

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        rate = self.subsampling_rate
        x = np.asarray(self.data_x[idx], np.float32)
        y = np.asarray(self.data_y[idx], np.float32)
        if rate > 1:
            sl = tuple([slice(None)] + [slice(None, None, rate)] * (x.ndim - 1))
            x, y = x[sl], y[sl]
        if x.ndim == y.ndim and x.ndim >= 2 and x.shape[0] != 1:
            x, y = x[None], y[None]  # add channel dim if squeezed
        if self.transform_x is not None:
            x = self.transform_x(x)
        if self.transform_y is not None:
            y = self.transform_y(y)
        return {"x": x, "y": y}

    def close(self):
        self._file.close()

from .zarr_dataset import ZarrDataset  # noqa: E402,F401


