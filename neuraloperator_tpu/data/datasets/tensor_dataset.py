"""In-memory tensor datasets and a numpy batch loader.

JAX replacement for the reference's torch ``TensorDataset`` + ``DataLoader``
(reference ``neuralop/data/datasets/tensor_dataset.py``): samples are dicts
of numpy arrays; the loader yields stacked dict batches with optional
shuffling and drop-last. Host-side numpy feeding a jitted device step is the
standard TPU input pipeline for in-memory scientific datasets.
"""

from typing import Dict, Iterator, List, Optional

import numpy as np


class TensorDataset:
    """Dict-of-arrays dataset: sample i is {'x': x[i], 'y': y[i], ...}."""

    def __init__(self, x: np.ndarray, y: np.ndarray, **extras):
        assert len(x) == len(y), "x and y must have the same first dim"
        self.arrays: Dict[str, np.ndarray] = {"x": np.asarray(x), "y": np.asarray(y)}
        for k, v in extras.items():
            assert len(v) == len(x)
            self.arrays[k] = np.asarray(v)

    def __len__(self) -> int:
        return len(self.arrays["x"])

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {k: v[i] for k, v in self.arrays.items()}


class DictDataset:
    """A dataset over a list of dict samples (reference dict_dataset.py:6)."""

    def __init__(self, data_list: List[dict], constant: Optional[dict] = None):
        self.data_list = data_list
        self.constant = constant or {}

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, i):
        return {**self.data_list[i], **self.constant}


class DataLoader:
    """Minimal epoch iterator over a dataset, yielding dict batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = order[start : start + self.batch_size]
            if hasattr(self.dataset, "arrays"):
                yield {k: v[idx] for k, v in self.dataset.arrays.items()}
            else:
                samples = [self.dataset[int(i)] for i in idx]
                yield {
                    k: np.stack([s[k] for s in samples]) for k in samples[0]
                }


class GeneralTensorDataset:
    """N aligned arrays + per-array transforms (reference
    tensor_dataset.py:28-51). Returns a list of items (or a single item
    when constructed with one array)."""

    def __init__(self, sets, transforms):
        assert len(sets) == len(transforms), (
            "Size mismatch between number of tensors and transforms"
        )
        self.n = len(sets)
        for j in range(1, self.n):
            assert len(sets[j]) == len(sets[0]), (
                "Size mismatch between tensors"
            )
        self.sets = sets
        self.transforms = transforms

    def __len__(self):
        return len(self.sets[0])

    def __getitem__(self, index):
        if self.n > 1:
            items = []
            for j in range(self.n):
                item = self.sets[j][index]
                if self.transforms[j] is not None:
                    item = self.transforms[j](item)
                items.append(item)
            return items
        item = self.sets[0][index]
        if self.transforms[0] is not None:
            item = self.transforms[0](item)
        return item
