"""Darcy flow dataset.

Equivalent of reference ``neuralop/data/datasets/darcy.py``: the small
Darcy-flow example dataset (16x16 train, 16/32 test) and its loader
``load_darcy_flow_small``. The reference ships mini ``.pt`` files in-repo;
we read those files if present (data, not code) and otherwise *generate*
equivalent data with an in-package numpy Darcy solver (see
:mod:`.synthetic`), so the loader works hermetically.
"""

from pathlib import Path
from typing import List, Optional

from .pt_dataset import PTDataset
from .tensor_dataset import DataLoader

# Known locations of the example .pt files (reference ships them in-repo).
_CANDIDATE_ROOTS = [
    Path(__file__).parent / "data",
    Path("/root/reference/neuralop/data/datasets/data"),
]


def _find_root(explicit: Optional[str] = None) -> Optional[Path]:
    if explicit is not None:
        return Path(explicit)
    for root in _CANDIDATE_ROOTS:
        if (root / "darcy_train_16.pt").exists():
            return root
    return None


class DarcyDataset(PTDataset):
    """Darcy-flow PTDataset (reference darcy.py:17-150, sans Zenodo download)."""

    def __init__(
        self,
        root_dir,
        n_train: int,
        n_tests: List[int],
        batch_size: int,
        test_batch_sizes: List[int],
        train_resolution: int = 16,
        test_resolutions: List[int] = (16, 32),
        encode_input: bool = False,
        encode_output: bool = True,
        encoding="channel-wise",
        channel_dim=1,
        **kwargs,
    ):
        super().__init__(
            root_dir=root_dir,
            dataset_name="darcy",
            n_train=n_train,
            n_tests=n_tests,
            batch_size=batch_size,
            test_batch_sizes=test_batch_sizes,
            train_resolution=train_resolution,
            test_resolutions=list(test_resolutions),
            encode_input=encode_input,
            encode_output=encode_output,
            encoding=encoding,
            channel_dim=channel_dim,
            **kwargs,
        )


def load_darcy_flow_small(
    n_train: int,
    n_tests: List[int],
    batch_size: int,
    test_batch_sizes: List[int],
    test_resolutions: List[int] = (16, 32),
    data_root: Optional[str] = None,
    encode_input: bool = False,
    encode_output: bool = True,
    encoding: str = "channel-wise",
    seed: int = 0,
    train_resolution: int = 16,
):
    """Load the small Darcy dataset (reference darcy.py:151-199).

    Returns (train_loader, test_loaders, data_processor).

    ``train_resolution`` generalizes the reference helper (fixed 16):
    other grids use synthetic files generated into a cache keyed by
    (resolution, sample counts), so reruns with different counts
    regenerate instead of silently subsampling a stale cache.
    """
    n_test_req = max(max(n_tests), 50)
    if train_resolution == 16:
        root = _find_root(data_root)
        if root is None:
            from .synthetic import generate_darcy_files

            root = Path(__file__).parent / "data"
            generate_darcy_files(
                root,
                n_train=max(n_train, 100),
                n_test=n_test_req,
                resolutions=sorted(set([16] + list(test_resolutions))),
            )
    else:
        import tempfile

        from .synthetic import generate_darcy_files

        resolutions = sorted(
            set([train_resolution] + list(test_resolutions))
        )
        root = (
            Path(data_root)
            if data_root is not None
            else Path(tempfile.gettempdir())
            / (
                f"neuraloperator_tpu_darcy_r{train_resolution}"
                f"_n{max(n_train, 100)}_t{n_test_req}"
            )
        )
        if not all(
            (root / f"darcy_{split}_{r}.pt").exists()
            for r in resolutions
            for split in ("train", "test")
        ):
            generate_darcy_files(
                root,
                n_train=max(n_train, 100),
                n_test=n_test_req,
                resolutions=resolutions,
            )

    dataset = DarcyDataset(
        root_dir=root,
        n_train=n_train,
        n_tests=n_tests,
        batch_size=batch_size,
        test_batch_sizes=test_batch_sizes,
        train_resolution=train_resolution,
        test_resolutions=list(test_resolutions),
        encode_input=encode_input,
        encode_output=encode_output,
        encoding=encoding,
    )
    train_loader = DataLoader(
        dataset.train_db, batch_size=batch_size, shuffle=True, seed=seed
    )
    test_loaders = {
        res: DataLoader(db, batch_size=bs, shuffle=False)
        for (res, db), bs in zip(dataset.test_dbs.items(), test_batch_sizes)
    }
    return train_loader, test_loaders, dataset.data_processor


def load_darcy_pt(
    n_train: int,
    n_tests: List[int],
    batch_size: int,
    test_batch_sizes: List[int],
    data_root: Optional[str] = None,
    train_resolution: int = 16,
    test_resolutions: List[int] = (16, 32),
    encode_input: bool = False,
    encode_output: bool = True,
    encoding: str = "channel-wise",
    channel_dim: int = 1,
    **kwargs,
):
    """Load Darcy flow from .pt files at a chosen training resolution
    (reference darcy.py:202-251). Returns
    (train_loader, test_loaders, data_processor)."""
    dataset = DarcyDataset(
        root_dir=_find_root(data_root),
        n_train=n_train,
        n_tests=n_tests,
        batch_size=batch_size,
        test_batch_sizes=test_batch_sizes,
        train_resolution=train_resolution,
        test_resolutions=list(test_resolutions),
        encode_input=encode_input,
        encode_output=encode_output,
        encoding=encoding,
        channel_dim=channel_dim,
    )
    train_loader = DataLoader(dataset.train_db, batch_size)
    test_loaders = {
        res: DataLoader(db, bs)
        for (res, db), bs in zip(
            dataset.test_dbs.items(), test_batch_sizes
        )
    }
    return train_loader, test_loaders, dataset.data_processor
