"""Burgers' equation dataset.

Equivalent of reference ``neuralop/data/datasets/burgers.py``: 1-D viscous
Burgers input/output pairs. Reads the shipped mini ``.pt`` files when
available, otherwise generates data with the in-package pseudo-spectral
solver (``synthetic.solve_burgers_1d``).
"""

from pathlib import Path
from typing import List, Optional

from .darcy import _CANDIDATE_ROOTS
from .pt_dataset import PTDataset
from .tensor_dataset import DataLoader


def _find_root(explicit=None):
    if explicit is not None:
        return Path(explicit)
    for root in _CANDIDATE_ROOTS:
        if (root / "burgers_train_16.pt").exists():
            return root
    return None


class BurgersDataset(PTDataset):
    """1-D Burgers PTDataset (reference burgers.py)."""

    def __init__(
        self,
        root_dir,
        n_train: int,
        n_tests: List[int],
        batch_size: int,
        test_batch_sizes: List[int],
        train_resolution: int = 16,
        test_resolutions: List[int] = (16,),
        **kwargs,
    ):
        super().__init__(
            root_dir=root_dir,
            dataset_name="burgers",
            n_train=n_train,
            n_tests=n_tests,
            batch_size=batch_size,
            test_batch_sizes=test_batch_sizes,
            train_resolution=train_resolution,
            test_resolutions=list(test_resolutions),
            **kwargs,
        )


def load_mini_burgers_1dtime(*args, **kwargs):
    """Alias used by reference scripts."""
    return load_burgers_1d(*args, **kwargs)


def load_burgers_1d(
    n_train: int,
    n_tests: List[int],
    batch_size: int,
    test_batch_sizes: List[int],
    data_root: Optional[str] = None,
    train_resolution: int = 16,
    test_resolutions: List[int] = (16,),
    seed: int = 0,
    **kwargs,
):
    """Returns (train_loader, test_loaders, data_processor)."""
    root = _find_root(data_root)
    if root is None:
        from .synthetic import generate_burgers_files

        root = Path(__file__).parent / "data"
        generate_burgers_files(
            root, n_train=max(n_train, 100), n_test=max(max(n_tests), 50),
            res=train_resolution,
        )
    ds = BurgersDataset(
        root_dir=root,
        n_train=n_train,
        n_tests=n_tests,
        batch_size=batch_size,
        test_batch_sizes=test_batch_sizes,
        train_resolution=train_resolution,
        test_resolutions=list(test_resolutions),
        **kwargs,
    )
    train_loader = DataLoader(ds.train_db, batch_size, shuffle=True, seed=seed)
    test_loaders = {
        res: DataLoader(db, bs)
        for (res, db), bs in zip(ds.test_dbs.items(), test_batch_sizes)
    }
    return train_loader, test_loaders, ds.data_processor
