"""Data processor for the_well-style autoregressive rollout datasets.

Equivalent of reference ``neuralop/data/transforms/the_well_data_processors.py``:
normalization plus step-aware pre/postprocessing so the Trainer's
autoregressive evaluation can roll a trajectory forward, feeding each
prediction back in as the next input.
"""

from typing import Optional

import jax.numpy as jnp

from .data_processors import DataProcessor


class TheWellDataProcessor(DataProcessor):
    """Normalization + autoregressive stepping (reference :66-187).

    Samples are {'x': (b, c, spatial...), 'y': (b, T, c, spatial...)}.
    During training a single step is supervised; during rollout evaluation
    ``preprocess(sample, step=t)`` swaps the input for the previous
    prediction.
    """

    def __init__(self, normalizer=None, n_steps_rollout: Optional[int] = None):
        self.normalizer = normalizer
        self.n_steps_rollout = n_steps_rollout
        self._last_prediction = None

    def preprocess(self, sample: dict, train: bool = True, step: int = 0):
        sample = dict(sample)
        if step > 0 and self._last_prediction is not None:
            sample["x"] = self._last_prediction
        if self.normalizer is not None:
            sample["x"] = self.normalizer.transform(sample["x"])
            if train and sample.get("y") is not None:
                y = sample["y"]
                sample["y"] = self.normalizer.transform(y)
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        if self.normalizer is not None and not train:
            out = self.normalizer.inverse_transform(out)
        self._last_prediction = out
        return out, sample
