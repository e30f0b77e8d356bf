"""PTDataset: load {name}_{split}_{res}.pt dict files into numpy datasets.

Equivalent of reference ``neuralop/data/datasets/pt_dataset.py``: loads
``{'x': ..., 'y': ...}`` tensors, handles channel squeezing/subsampling,
fits channel-wise UnitGaussianNormalizers on the train split and exposes
``train_db`` / ``test_dbs`` / ``data_processor``.

Torch (CPU) is used purely as a ``.pt`` deserializer; everything downstream
is numpy/JAX. Synthetic data generation is available via
``neuraloperator_tpu.data.datasets.synthetic`` when no files exist.
"""

from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from ..transforms.data_processors import DefaultDataProcessor
from ..transforms.normalizers import UnitGaussianNormalizer
from .tensor_dataset import TensorDataset


def load_pt_as_numpy(path) -> dict:
    """Deserialize a torch .pt dict into numpy arrays."""
    import torch

    data = torch.load(Path(path).as_posix(), weights_only=False)
    out = {}
    for k, v in data.items():
        if hasattr(v, "numpy"):
            v = v.detach().cpu()
            if v.dtype == torch.bool:
                v = v.float()
            out[k] = v.numpy()
        else:
            out[k] = v
    return out


class PTDataset:
    """See reference PTDataset docstring (pt_dataset.py:12-73)."""

    def __init__(
        self,
        root_dir: Union[Path, str],
        dataset_name: str,
        n_train: int,
        n_tests: List[int],
        batch_size: int,
        test_batch_sizes: List[int],
        train_resolution: int,
        test_resolutions: List[int],
        encode_input: bool = False,
        encode_output: bool = True,
        encoding: str = "channel-wise",
        input_subsampling_rate=None,
        output_subsampling_rate=None,
        channel_dim: int = 1,
        channels_squeezed: bool = True,
    ):
        root_dir = Path(root_dir)
        self.batch_size = batch_size
        self.test_resolutions = test_resolutions
        self.test_batch_sizes = test_batch_sizes

        data = load_pt_as_numpy(
            root_dir / f"{dataset_name}_train_{train_resolution}.pt"
        )
        x_train = np.asarray(data["x"], dtype=np.float32)
        y_train = np.asarray(data["y"], dtype=np.float32)
        if channels_squeezed:
            x_train = np.expand_dims(x_train, channel_dim)
            y_train = np.expand_dims(y_train, channel_dim)

        x_train = self._subsample(
            x_train, n_train, input_subsampling_rate, channel_dim
        )
        y_train = self._subsample(
            y_train, n_train, output_subsampling_rate, channel_dim
        )

        input_encoder = None
        if encode_input:
            input_encoder = UnitGaussianNormalizer(
                dim=self._reduce_dims(x_train.ndim, channel_dim, encoding)
            ).fit(x_train)
        output_encoder = None
        if encode_output:
            output_encoder = UnitGaussianNormalizer(
                dim=self._reduce_dims(y_train.ndim, channel_dim, encoding)
            ).fit(y_train)

        self._train_db = TensorDataset(x_train, y_train)
        self._data_processor = DefaultDataProcessor(
            in_normalizer=input_encoder, out_normalizer=output_encoder
        )

        self._test_dbs = {}
        for res, n_test in zip(test_resolutions, n_tests):
            data = load_pt_as_numpy(root_dir / f"{dataset_name}_test_{res}.pt")
            x_test = np.asarray(data["x"], dtype=np.float32)
            y_test = np.asarray(data["y"], dtype=np.float32)
            if channels_squeezed:
                x_test = np.expand_dims(x_test, channel_dim)
                y_test = np.expand_dims(y_test, channel_dim)
            x_test = self._subsample(
                x_test, n_test, input_subsampling_rate, channel_dim
            )
            y_test = self._subsample(
                y_test, n_test, output_subsampling_rate, channel_dim
            )
            self._test_dbs[res] = TensorDataset(x_test, y_test)

    @staticmethod
    def _reduce_dims(ndim: int, channel_dim: int, encoding: str):
        if encoding == "channel-wise":
            dims = list(range(ndim))
            dims.pop(channel_dim)
            return dims
        if encoding == "pixel-wise":
            return [0]
        raise ValueError(f"unknown encoding {encoding}")

    @staticmethod
    def _subsample(arr, n: int, rate, channel_dim: int):
        spatial_dims = arr.ndim - 2
        if not rate:
            rate = 1
        if not isinstance(rate, list):
            rate = [rate] * spatial_dims
        assert len(rate) == spatial_dims
        idx = [slice(0, n)] + [slice(None, None, r) for r in rate]
        idx.insert(channel_dim, slice(None))
        return arr[tuple(idx)]

    @property
    def data_processor(self):
        return self._data_processor

    @property
    def train_db(self):
        return self._train_db

    @property
    def test_dbs(self):
        return self._test_dbs
