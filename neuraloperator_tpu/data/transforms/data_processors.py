"""Data processors bridging datasets and the trainer.

Equivalent of reference ``neuralop/data/transforms/data_processors.py``:
``preprocess`` runs before the model (normalization), ``postprocess``
after (denormalization at eval time). Processors are pure with an explicit
``train`` flag so they can live inside jitted train/eval steps.
"""

from typing import Optional

import jax.numpy as jnp


class DataProcessor:
    """ABC (reference data_processors.py:11-66)."""

    def preprocess(self, sample: dict, train: bool = True) -> dict:
        raise NotImplementedError

    def postprocess(self, out, sample: dict, train: bool = True):
        raise NotImplementedError

    def wrap(self, model_apply):
        self.model_apply = model_apply
        return self


class DefaultDataProcessor(DataProcessor):
    """Normalize x always; normalize y during training, denormalize
    predictions at eval (reference data_processors.py:98-153).
    """

    def __init__(self, in_normalizer=None, out_normalizer=None):
        self.in_normalizer = in_normalizer
        self.out_normalizer = out_normalizer

    def preprocess(self, sample: dict, train: bool = True) -> dict:
        sample = dict(sample)
        if self.in_normalizer is not None:
            sample["x"] = self.in_normalizer.transform(sample["x"])
        if self.out_normalizer is not None and train:
            sample["y"] = self.out_normalizer.transform(sample["y"])
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        if self.out_normalizer is not None and not train:
            out = self.out_normalizer.inverse_transform(out)
        return out, sample

    def feedback(self, out):
        """Map an encoded-y prediction to the encoded-x input space.

        Used by rollout (pushforward) training to feed the model its own
        prediction as the next input when input and output use different
        normalizers (Trainer rollout branch, trainer.py:157-167).
        """
        if self.out_normalizer is not None:
            out = self.out_normalizer.inverse_transform(out)
        if self.in_normalizer is not None:
            out = self.in_normalizer.transform(out)
        return out

    def state_dict(self) -> dict:
        """JSON-serializable fitted state, saved as a checkpoint sidecar.

        Normalizer statistics are fit on the TRAIN split, so a checkpoint
        evaluated under a rebuilt pipeline (different n_train, extended
        data file, different seed) silently sees differently-scaled
        inputs — at flagship error levels (1e-4 rel l2) that mismatch
        dominates the measurement. Persisting the processor makes the
        checkpoint self-contained.
        """
        return {
            "type": "DefaultDataProcessor",
            "in_normalizer": (
                None
                if self.in_normalizer is None
                else self.in_normalizer.state_dict()
            ),
            "out_normalizer": (
                None
                if self.out_normalizer is None
                else self.out_normalizer.state_dict()
            ),
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "DefaultDataProcessor":
        from .normalizers import UnitGaussianNormalizer

        def norm(s):
            return None if s is None else UnitGaussianNormalizer.from_state_dict(s)

        return cls(
            in_normalizer=norm(state.get("in_normalizer")),
            out_normalizer=norm(state.get("out_normalizer")),
        )


def load_data_processor(save_dir, filename: str = "data_processor.json"):
    """Reconstruct the data processor saved alongside a checkpoint.

    Returns None when no sidecar exists (older checkpoints) so callers can
    fall back to refitting from the dataset. Only processor types whose
    fitted state is pure statistics round-trip; schedule-only processors
    (Incremental, MGPatching) reconstruct from their config instead.
    """
    import json
    from pathlib import Path

    path = Path(save_dir) / filename
    if not path.exists():
        return None
    state = json.loads(path.read_text())
    registry = {"DefaultDataProcessor": DefaultDataProcessor}
    klass = registry.get(state.get("type"))
    if klass is None:
        raise ValueError(
            f"unknown data processor type {state.get('type')!r} in {path}"
        )
    return klass.from_state_dict(state)


class IncrementalDataProcessor(DataProcessor):
    """Epoch-scheduled resolution curriculum.

    Mirrors reference ``IncrementalDataProcessor``
    (data_processors.py:171-304): subsample the spatial dims by a decreasing
    factor according to an epoch schedule. Since jit requires static shapes,
    the current subsampling factor is applied on the host (numpy slicing in
    the loader path) and each new resolution triggers one retrace.
    """

    def __init__(
        self,
        in_normalizer=None,
        out_normalizer=None,
        device=None,
        subsampling_rates=(2, 1),
        dataset_resolution: int = 16,
        dataset_indices=(2, 3),
        epoch_gap: int = 10,
        verbose: bool = False,
    ):
        self.in_normalizer = in_normalizer
        self.out_normalizer = out_normalizer
        self.subsampling_rates = list(subsampling_rates)
        self.dataset_resolution = dataset_resolution
        self.dataset_indices = list(dataset_indices)
        self.epoch_gap = epoch_gap
        self.verbose = verbose
        self.epoch = 0
        self.current_index = 0

    def epoch_wise_res_increase(self, epoch: int):
        if (
            epoch % self.epoch_gap == 0
            and epoch != 0
            and self.current_index < len(self.subsampling_rates) - 1
        ):
            self.current_index += 1
            if self.verbose:
                print(
                    f"Incremental resolution: rate "
                    f"{self.subsampling_rates[self.current_index]} at epoch {epoch}"
                )

    def step(self, epoch: int):
        self.epoch = epoch
        self.epoch_wise_res_increase(epoch)

    def regularize_input_res(self, x, y):
        rate = self.subsampling_rates[self.current_index]
        if rate > 1:
            idx = [slice(None)] * x.ndim
            for d in self.dataset_indices:
                idx[d] = slice(None, None, rate)
            x = x[tuple(idx)]
            y = y[tuple(idx)]
        return x, y

    def preprocess(self, sample: dict, train: bool = True) -> dict:
        sample = dict(sample)
        if self.in_normalizer is not None:
            sample["x"] = self.in_normalizer.transform(sample["x"])
        if self.out_normalizer is not None and train:
            sample["y"] = self.out_normalizer.transform(sample["y"])
        if train:
            sample["x"], sample["y"] = self.regularize_input_res(
                sample["x"], sample["y"]
            )
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        if self.out_normalizer is not None and not train:
            out = self.out_normalizer.inverse_transform(out)
        return out, sample


class MGPatchingDataProcessor(DataProcessor):
    """Bridge MultigridPatching2D into the Trainer.

    Mirrors reference ``MGPatchingDataProcessor``
    (data_processors.py:305-418): inputs are MG-patched before the model and
    outputs are unpatched/stitched after, composing with an optional inner
    normalization processor.
    """

    def __init__(
        self,
        model=None,
        levels: int = 0,
        padding_fraction=0,
        stitching: bool = True,
        use_distributed: bool = False,
        mesh=None,
        in_normalizer=None,
        out_normalizer=None,
    ):
        from ...training.patching import MultigridPatching2D

        self.patcher = MultigridPatching2D(
            model=model,
            levels=levels,
            padding_fraction=padding_fraction,
            use_distributed=use_distributed,
            stitching=stitching,
            mesh=mesh,
        )
        self.in_normalizer = in_normalizer
        self.out_normalizer = out_normalizer
        self._eval = False

    def preprocess(self, sample: dict, train: bool = True) -> dict:
        sample = dict(sample)
        if self.in_normalizer is not None:
            sample["x"] = self.in_normalizer.transform(sample["x"])
        if self.out_normalizer is not None and train:
            sample["y"] = self.out_normalizer.transform(sample["y"])
        self._eval = not train
        sample["x"], sample["y"] = self.patcher.patch(sample["x"], sample["y"])
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        out, y = self.patcher.unpatch(out, sample["y"], evaluation=not train)
        if self.out_normalizer is not None and not train:
            out = self.out_normalizer.inverse_transform(out)
        sample = dict(sample)
        sample["y"] = y
        return out, sample
