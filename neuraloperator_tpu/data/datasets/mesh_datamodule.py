"""Mesh data module for CFD-style point-cloud datasets.

Equivalent of reference ``neuralop/data/datasets/mesh_datamodule.py``
(open3d-based mesh loading) redesigned without open3d: geometry arrives as
dict samples of numpy arrays (vertices, normals, areas, query grids); .pt
mesh archives (e.g. the mini car dataset the reference ships) are consumed
directly.
"""

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .tensor_dataset import DictDataset


class MeshDataModule:
    """Load a list-of-dicts mesh dataset from a .pt archive.

    Exposes ``train_data``/``test_data`` DictDatasets whose samples contain
    (at least) vertices, per-sample query grids and pressure targets.
    """

    def __init__(
        self,
        root_dir,
        dataset_name: str = None,
        item_keys: Optional[List[str]] = None,
        n_train: int = None,
        n_test: int = None,
        file_name: Optional[str] = None,
    ):
        import torch

        root_dir = Path(root_dir)
        path = root_dir / (file_name or f"{dataset_name}.pt")
        raw = torch.load(path.as_posix(), weights_only=False)
        data = []
        for entry in raw:
            sample = {}
            for k, v in entry.items():
                if item_keys is not None and k not in item_keys:
                    continue
                sample[k] = (
                    v.detach().cpu().numpy() if hasattr(v, "numpy") else v
                )
            data.append(sample)

        n_train = n_train if n_train is not None else max(len(data) - 1, 1)
        n_test = n_test if n_test is not None else len(data) - n_train
        self.train_data = DictDataset(data[:n_train])
        self.test_data = DictDataset(data[n_train : n_train + n_test])
        self.data = data
