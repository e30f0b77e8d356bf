"""Car-CFD dataset (surface pressure on vehicle meshes).

Equivalent of reference ``neuralop/data/datasets/car_cfd_dataset.py``:
mesh samples with vertices, normals, SDF query grids and surface pressure.
``load_mini_car`` reads the 3-sample mini dataset the reference ships
in-repo (pure data; consumed at runtime, not copied).
"""

from pathlib import Path
from typing import List, Optional

import numpy as np

from .darcy import _CANDIDATE_ROOTS
from .mesh_datamodule import MeshDataModule


class CarCFDDataset(MeshDataModule):
    """Full car-CFD dataset (reference car_cfd_dataset.py:11-100).

    The full dataset requires a download; this class loads any compatible
    .pt archive of mesh dicts.
    """

    def __init__(
        self,
        root_dir,
        n_train: int = 1,
        n_test: int = 1,
        file_name: str = "mini_car.pt",
        **kwargs,
    ):
        super().__init__(
            root_dir=root_dir,
            n_train=n_train,
            n_test=n_test,
            file_name=file_name,
            **kwargs,
        )


def load_mini_car(data_root: Optional[str] = None) -> List[dict]:
    """Load the 3-example mini car dataset (reference car_cfd_dataset.py:101).

    Returns a list of dict samples with numpy arrays.
    """
    import torch

    candidates = (
        [Path(data_root)] if data_root is not None else _CANDIDATE_ROOTS
    )
    for root in candidates:
        path = Path(root) / "mini_car.pt"
        if path.exists():
            raw = torch.load(path.as_posix(), weights_only=False)
            return [
                {
                    k: (v.detach().cpu().numpy() if hasattr(v, "numpy") else v)
                    for k, v in entry.items()
                }
                for entry in raw
            ]
    raise FileNotFoundError(
        "mini_car.pt not found; pass data_root explicitly"
    )
