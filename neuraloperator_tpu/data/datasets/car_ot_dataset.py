"""OT-preprocessed car-CFD dataset for OTNO.

Equivalent of reference ``neuralop/data/datasets/car_ot_dataset.py``: loads
precomputed optimal-transport archives (source sphere grid, transported
coordinates, encoder/decoder index maps, surface pressure) and provides the
``CFDDataProcessor`` that reshapes samples into OTNO inputs.
"""

from pathlib import Path
from typing import List, Optional

import numpy as np

from ..transforms.data_processors import DataProcessor
from .darcy import _CANDIDATE_ROOTS
from .tensor_dataset import DictDataset


def load_car_ot(data_root: Optional[str] = None, file_name: Optional[str] = None):
    """Load an OT car archive (the reference ships a 3-sample mini file)."""
    import torch

    candidates = (
        [Path(data_root)] if data_root is not None else _CANDIDATE_ROOTS
    )
    for root in candidates:
        root = Path(root)
        if file_name is not None:
            paths = [root / file_name]
        else:
            paths = sorted(root.glob("ot_*.pt"))
        for path in paths:
            if path.exists():
                raw = torch.load(path.as_posix(), weights_only=False)
                return [
                    {
                        k: (
                            v.detach().cpu().numpy()
                            if hasattr(v, "numpy")
                            else v
                        )
                        for k, v in entry.items()
                    }
                    for entry in raw
                ]
    raise FileNotFoundError("no ot_*.pt archive found; pass data_root")


class CarOTDataset:
    """Train/test split over OT car samples (reference car_ot_dataset.py)."""

    def __init__(self, n_train: int = 2, n_test: int = 1,
                 data_root: Optional[str] = None):
        data = load_car_ot(data_root)
        self.train_data = DictDataset(data[:n_train])
        self.test_data = DictDataset(data[n_train : n_train + n_test])


class CFDDataProcessor(DataProcessor):
    """Reshape OT samples into OTNO inputs (reference car_ot_dataset.py:185).

    The OTNO input is the transported coordinates as a (1, C, s, s) grid;
    ``ind_dec`` gathers latent features back to the target mesh; pressure is
    the target.
    """

    def __init__(self, normalizer=None):
        self.normalizer = normalizer

    def preprocess(self, sample: dict, train: bool = True) -> dict:
        sample = dict(sample)
        trans = np.asarray(sample["trans"], np.float32)
        source = np.asarray(sample["source"], np.float32)
        n = int(round(np.sqrt(trans.shape[0])))
        feats = np.concatenate([source, trans], axis=-1)  # (s*s, 6)
        x = feats.T.reshape(1, -1, n, n)
        press = np.asarray(sample["press"], np.float32)
        ind_dec = np.asarray(sample["ind_dec"], np.int64)
        y = press[: ind_dec.shape[0]][None]  # (1, n_target)
        if self.normalizer is not None and train:
            y = self.normalizer.transform(y)
        sample.update({"x": x, "ind_dec": ind_dec, "y": y})
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        if self.normalizer is not None and not train:
            out = self.normalizer.inverse_transform(out)
        return out, sample


# Reference name (car_ot_dataset.py:119): the class that loads the
# shipped OT archive is called load_saved_ot there.
load_saved_ot = CarOTDataset
