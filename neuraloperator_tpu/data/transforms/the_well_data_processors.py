"""Data processor for the_well-style autoregressive rollout datasets.

Schema-faithful equivalent of reference
``neuralop/data/transforms/the_well_data_processors.py:38-187``
(``TheWellDataProcessor``): accepts batches in the_well's native layout —

- ``input_fields``  ``(b, n_steps_input, d1..dN, c)``  trailing channels
- ``output_fields`` ``(b, T, d1..dN, c)``              trailing channels
- ``constant_fields`` ``(b, d1..dN, c_const)``         optional

— permutes channels first, normalizes time-varying fields channel-wise
(``data_normalizer``) and constant fields with their own
``const_normalizer``, optionally flattens time into channels
(``time_as_channels``, t-major like the reference's
``rearrange('b c t ... -> b (t c) ...')``), and concatenates the
normalized constants onto ``x``.

TPU-native redesign of the rollout protocol: the reference mutates
``data_dict['input_fields']`` across a host loop of per-step forwards
(reference :150-187). Here the Trainer rolls out inside ONE jitted
``lax.scan`` (trainer.py ``_eval_autoregressive``), so feedback is the
pure function :meth:`ar_feedback` — it takes the previous model input
and the new (unnormalized) prediction and returns the next model input
(shift the input window one step, append the normalized prediction,
keep the constant channels). :meth:`format_rollout_batch` builds the
scan's initial carry and the raw trajectory targets from a the_well
batch, mirroring the reference's ``step=0`` path (x0 = the first
``n_steps_input`` steps of ``output_fields``, reference :77-83).

Back-compat: already-formatted samples ``{'x', 'y'}`` flow through the
pre-round-5 shim semantics (normalize x, normalize y at train,
unnormalize predictions at eval).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .data_processors import DataProcessor

_FIELD_KEYS = ("input_fields", "output_fields", "constant_fields")


class TheWellDataProcessor(DataProcessor):
    """Normalization + schema handling + autoregressive stepping.

    Parameters mirror the reference (:38-56): ``data_normalizer``
    (channel-wise stats over ``(b, t, spatial)``, i.e. fitted on
    ``(b, c, t, d1..dN)`` with ``dim=[0, 2, 3, ...]``),
    ``const_normalizer`` (stats on ``(b, c_const, d1..dN)``),
    ``n_steps_input``/``n_steps_output``, ``time_as_channels`` (which
    requires ``n_steps_output == 1``, as in the reference).
    ``n_steps_rollout`` optionally caps the Trainer's autoregressive
    eval horizon. ``normalizer`` is the legacy alias for
    ``data_normalizer``.
    """

    def __init__(
        self,
        data_normalizer=None,
        const_normalizer=None,
        n_steps_input: int = 1,
        n_steps_output: int = 1,
        time_as_channels: bool = True,
        n_steps_rollout: Optional[int] = None,
        normalizer=None,
    ):
        if normalizer is not None and data_normalizer is None:
            data_normalizer = normalizer
        self.data_normalizer = data_normalizer
        self.normalizer = data_normalizer  # legacy attribute name
        self.const_normalizer = const_normalizer
        self.n_steps_input = n_steps_input
        self.n_steps_output = n_steps_output
        self.time_as_channels = time_as_channels
        self.n_steps_rollout = n_steps_rollout
        if time_as_channels and n_steps_output != 1:
            raise ValueError(
                "time_as_channels requires n_steps_output == 1 — predict "
                "multiple output steps with a spatiotemporal model instead "
                "(reference the_well_data_processors.py:53-56)"
            )
        self._schema_used = False
        self._n_var_channels = None  # channels of x occupied by variables
        self._step_channels = None  # channels per single timestep
        self._last_prediction = None  # legacy non-scan feedback

    # ------------------------------------------------------------------
    # normalization helpers: data_normalizer statistics are fitted on
    # (b, c, t, spatial...) — when a time-flattened (b, c, spatial...)
    # array needs (un)normalizing, re-insert the singleton time dim at
    # axis 2 exactly like the reference's unsqueeze(2)/squeeze(2) dance
    # (:161-173); valid because n_steps_output == 1 under
    # time_as_channels.
    def _stats_ndim(self):
        mean = getattr(self.data_normalizer, "mean", None)
        return None if mean is None else np.ndim(mean)

    def _norm(self, a):
        nd = self._stats_ndim()
        if nd is not None and nd == a.ndim + 1:
            return self.data_normalizer.transform(a[:, :, None])[:, :, 0]
        return self.data_normalizer.transform(a)

    def _unnorm(self, a):
        nd = self._stats_ndim()
        if nd is not None and nd == a.ndim + 1:
            return self.data_normalizer.inverse_transform(a[:, :, None])[
                :, :, 0
            ]
        return self.data_normalizer.inverse_transform(a)

    # ------------------------------------------------------------------
    def _flatten_time(self, a):
        """(b, c, t, spatial...) -> (b, t*c, spatial...), t-major — the
        reference's ``rearrange('b c t ... -> b (t c) ...')`` (:92)."""
        b, c, t = a.shape[:3]
        return jnp.swapaxes(a, 1, 2).reshape(b, t * c, *a.shape[3:])

    def _format_x(self, fields, constants):
        """the_well layout -> model input, storing the channel split used
        by :meth:`ar_feedback`."""
        x = jnp.moveaxis(jnp.asarray(fields), -1, 1)  # (b, c, t, sp...)
        self._step_channels = int(x.shape[1])
        n_t = int(x.shape[2])
        if self.data_normalizer is not None:
            x = self.data_normalizer.transform(x)
        if self.time_as_channels:
            x = self._flatten_time(x)
            self._n_var_channels = self._step_channels * n_t
        else:
            self._n_var_channels = self._step_channels
        if constants is not None:
            cf = jnp.moveaxis(jnp.asarray(constants), -1, 1)  # (b, cc, sp)
            if self.const_normalizer is not None:
                cf = self.const_normalizer.transform(cf)
            if not self.time_as_channels:
                # x stays (b, c, t, sp...): repeat constants along time
                cf = jnp.broadcast_to(
                    cf[:, :, None], cf.shape[:2] + (n_t,) + cf.shape[2:]
                )
            x = jnp.concatenate([x, cf], axis=1)
        return x

    # ------------------------------------------------------------------
    def preprocess(self, sample: dict, train: bool = True, step: int = 0):
        sample = dict(sample)
        if "output_fields" in sample or "input_fields" in sample:
            self._schema_used = True
            fields = sample.get("input_fields")
            if fields is None:
                # reference step=0 path (:77-83): reserve the first
                # n_steps_input steps of the trajectory as input
                fields = jnp.asarray(sample["output_fields"])[
                    :, : self.n_steps_input
                ]
            x = self._format_x(fields, sample.get("constant_fields"))
            y = jnp.moveaxis(jnp.asarray(sample["output_fields"]), -1, 1)
            if "input_fields" not in sample:
                # trajectory target: supervised window starts after the
                # input steps (reference :125-135)
                y = y[:, :, self.n_steps_input :][:, :, : self.n_steps_output]
            if self.data_normalizer is not None:
                y = self.data_normalizer.transform(y)
            if self.time_as_channels:
                y = self._flatten_time(y)
            out = {
                k: v for k, v in sample.items() if k not in _FIELD_KEYS
            }
            out["x"], out["y"] = x, y
            return out

        # already-formatted {'x','y'} samples: legacy shim semantics
        if step > 0 and self._last_prediction is not None:
            sample["x"] = self._last_prediction
        if self.normalizer is not None and not self._schema_used:
            sample["x"] = self.normalizer.transform(sample["x"])
            if train and sample.get("y") is not None:
                sample["y"] = self.normalizer.transform(sample["y"])
        return sample

    def postprocess(self, out, sample: dict, train: bool = True):
        if self.data_normalizer is not None and not train:
            out = self._unnorm(out) if self._schema_used else (
                self.data_normalizer.inverse_transform(out)
            )
            if self._schema_used and sample.get("y") is not None:
                # eval compares unnormalized fields (reference :155-173)
                sample = dict(sample)
                sample["y"] = self._unnorm(sample["y"])
        self._last_prediction = out
        return out, sample

    # ------------------------------------------------------------------
    # scan-native rollout protocol (consumed by Trainer._eval_autoregressive)
    def format_rollout_batch(self, sample: dict) -> dict:
        """the_well trajectory batch -> ``{'x': carry0, 'y': targets}``.

        ``x`` is the formatted (normalized, constants-appended) model
        input built from the first ``n_steps_input`` trajectory steps;
        ``y`` is the RAW (unnormalized) remainder of the trajectory as
        ``(b, T, c, spatial...)`` — the Trainer's scan compares
        unnormalized predictions against it, matching the reference's
        AR eval (:155-187).
        """
        self._schema_used = True
        of = jnp.asarray(sample["output_fields"])  # (b, T, sp..., c)
        fields = sample.get("input_fields")
        if fields is None:
            fields = of[:, : self.n_steps_input]
        x = self._format_x(fields, sample.get("constant_fields"))
        y = jnp.moveaxis(of, -1, 2)  # (b, T, c, spatial...)
        if "input_fields" not in sample:
            y = y[:, self.n_steps_input :]
        out = {k: v for k, v in sample.items() if k not in _FIELD_KEYS}
        out["x"], out["y"] = x, y
        return out

    def ar_feedback(self, x_prev, prediction):
        """Next scan carry: drop the oldest input step, append the new
        (normalized) prediction, keep constant channels — the pure-
        function form of the reference's ``input_fields`` roll (:176-184).
        """
        if self._n_var_channels is None:
            return prediction
        c = self._step_channels
        pred = (
            self._norm(prediction)
            if self.data_normalizer is not None
            else prediction
        )
        var = x_prev[:, : self._n_var_channels]
        const = x_prev[:, self._n_var_channels :]
        if self.time_as_channels:
            # t-major flatten: the first c channels are the oldest step
            var = jnp.concatenate([var[:, c:], pred], axis=1)
        else:
            var = jnp.concatenate(
                [var[:, :, 1:], pred[:, :, None]], axis=2
            )
        if const.shape[1]:
            return jnp.concatenate([var, const], axis=1)
        return var
