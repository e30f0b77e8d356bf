"""Transform base classes.

Equivalent of reference ``neuralop/data/transforms/base_transforms.py``:
``Transform`` ABC with ``transform``/``inverse_transform``, plus composite
and dict-dispatching variants.
"""

from typing import Dict, List


class Transform:
    """ABC (reference base_transforms.py:7)."""

    def transform(self, x):
        raise NotImplementedError

    def inverse_transform(self, x):
        raise NotImplementedError

    def __call__(self, x):
        return self.transform(x)


class CompositeTransform(Transform):
    """Apply transforms in sequence (reference :37)."""

    def __init__(self, transforms: List[Transform]):
        self.transforms = list(transforms)

    def transform(self, x):
        for t in self.transforms:
            x = t.transform(x)
        return x

    def inverse_transform(self, x):
        for t in reversed(self.transforms):
            x = t.inverse_transform(x)
        return x


class DictTransform(Transform):
    """Apply per-key transforms to dict samples (reference :74)."""

    def __init__(self, transform_dict: Dict[str, Transform]):
        self.transform_dict = dict(transform_dict)

    def transform(self, sample: dict) -> dict:
        return {
            k: (self.transform_dict[k].transform(v) if k in self.transform_dict else v)
            for k, v in sample.items()
        }

    def inverse_transform(self, sample: dict) -> dict:
        return {
            k: (
                self.transform_dict[k].inverse_transform(v)
                if k in self.transform_dict
                else v
            )
            for k, v in sample.items()
        }
