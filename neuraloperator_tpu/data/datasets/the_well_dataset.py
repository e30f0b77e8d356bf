"""Wrappers around the `the_well` PDE dataset collection.

Equivalent of reference ``neuralop/data/datasets/the_well_dataset.py``
(``WellDataset``, ``ActiveMatterDataset``, ``MHD64Dataset``). The
``the_well`` package is an optional dependency; when absent these classes
raise an informative ImportError at construction (the reference has the
same guard pattern).
"""

from typing import Optional


def _require_the_well():
    try:
        import the_well  # noqa: F401

        return the_well
    except ImportError as e:
        raise ImportError(
            "This dataset requires the optional 'the_well' package "
            "(https://github.com/PolymathicAI/the_well), which is not "
            "installed in this environment."
        ) from e


class WellDataset:
    """Base wrapper over the_well's dataset API (reference :15)."""

    def __init__(self, well_base_path, well_dataset_name, well_split_name,
                 n_steps_input=1, n_steps_output=1, **kwargs):
        tw = _require_the_well()
        from the_well.data import WellDataset as _WellDataset

        self._ds = _WellDataset(
            well_base_path=str(well_base_path),
            well_dataset_name=well_dataset_name,
            well_split_name=well_split_name,
            n_steps_input=n_steps_input,
            n_steps_output=n_steps_output,
            **kwargs,
        )

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, idx):
        import numpy as np

        item = self._ds[idx]
        return {
            k: (np.asarray(v) if hasattr(v, "__array__") else v)
            for k, v in item.items()
        }


class ActiveMatterDataset(WellDataset):
    """active_matter subset (reference :185)."""

    def __init__(self, well_base_path, well_split_name="train", **kwargs):
        super().__init__(
            well_base_path=well_base_path,
            well_dataset_name="active_matter",
            well_split_name=well_split_name,
            **kwargs,
        )


class MHD64Dataset(WellDataset):
    """MHD_64 subset (reference :208)."""

    def __init__(self, well_base_path, well_split_name="train", **kwargs):
        super().__init__(
            well_base_path=well_base_path,
            well_dataset_name="MHD_64",
            well_split_name=well_split_name,
            **kwargs,
        )
