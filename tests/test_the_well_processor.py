"""Schema-faithful TheWellDataProcessor (reference
the_well_data_processors.py:38-187) against stub batches in the_well's
native layout — no the_well package needed.

Covers: trailing-channel permutes, time_as_channels (t-major) flattening,
data/const normalizer application, constant-field concat, eval
unnormalization, the pure-function rollout feedback, and a stub-schema
batch rolling through Trainer autoregressive eval AND training
end-to-end.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from neuraloperator_tpu.data.datasets import DataLoader, DictDataset
from neuraloperator_tpu.data.transforms import TheWellDataProcessor
from neuraloperator_tpu.data.transforms.normalizers import (
    UnitGaussianNormalizer,
)
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw

B, T_IN, C, CC, RES = 2, 2, 3, 2, 8


def _well_batch(rng, n_out_steps=1, with_const=True, trajectory=False):
    """A batch in the_well's native layout (trailing channels)."""
    batch = {
        "output_fields": rng.randn(
            B, (T_IN + n_out_steps) if trajectory else n_out_steps,
            RES, RES, C,
        ).astype(np.float32),
    }
    if not trajectory:
        batch["input_fields"] = rng.randn(B, T_IN, RES, RES, C).astype(
            np.float32
        )
    if with_const:
        batch["constant_fields"] = rng.randn(B, RES, RES, CC).astype(
            np.float32
        )
    return batch


def _normalizers():
    # channel-wise stats fitted on (b, c, t, spatial...) like the
    # reference fits the_well variables
    rng = np.random.RandomState(7)
    data_n = UnitGaussianNormalizer(dim=[0, 2, 3, 4]).fit(
        rng.randn(4, C, 3, RES, RES).astype(np.float32) * 2 + 1
    )
    const_n = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(
        rng.randn(4, CC, RES, RES).astype(np.float32) * 3 - 1
    )
    return data_n, const_n


def test_preprocess_layout_and_time_flattening():
    rng = np.random.RandomState(0)
    batch = _well_batch(rng)
    dp = TheWellDataProcessor(n_steps_input=T_IN)
    out = dp.preprocess(dict(batch), train=True)

    # field keys are consumed (they must not leak into model kwargs)
    assert set(out) == {"x", "y"}
    assert out["x"].shape == (B, T_IN * C + CC, RES, RES)
    assert out["y"].shape == (B, C, RES, RES)

    # t-major flattening: channel block t*C + c equals input step t,
    # channel c (reference rearrange 'b c t ... -> b (t c) ...')
    for t in range(T_IN):
        for c in range(C):
            np.testing.assert_allclose(
                np.asarray(out["x"][:, t * C + c]),
                batch["input_fields"][:, t, :, :, c],
                rtol=1e-6,
            )
    # constants ride after the variable channels
    for cc in range(CC):
        np.testing.assert_allclose(
            np.asarray(out["x"][:, T_IN * C + cc]),
            batch["constant_fields"][:, :, :, cc],
            rtol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(out["y"][:, 1]), batch["output_fields"][:, 0, :, :, 1],
        rtol=1e-6,
    )


def test_normalizers_applied_channelwise():
    rng = np.random.RandomState(1)
    batch = _well_batch(rng)
    data_n, const_n = _normalizers()
    dp = TheWellDataProcessor(
        data_normalizer=data_n, const_normalizer=const_n,
        n_steps_input=T_IN,
    )
    out = dp.preprocess(dict(batch), train=True)

    xs = np.moveaxis(batch["input_fields"], -1, 1)  # (b, c, t, sp)
    expect = np.asarray(data_n.transform(xs))
    np.testing.assert_allclose(
        np.asarray(out["x"][:, :C]), expect[:, :, 0], rtol=1e-5
    )
    cf = np.moveaxis(batch["constant_fields"], -1, 1)
    np.testing.assert_allclose(
        np.asarray(out["x"][:, T_IN * C :]),
        np.asarray(const_n.transform(cf)),
        rtol=1e-5,
    )

    # eval postprocess unnormalizes both prediction and target
    pred = jnp.asarray(rng.randn(B, C, RES, RES).astype(np.float32))
    up, sample = dp.postprocess(pred, dict(out), train=False)
    manual = np.asarray(
        data_n.inverse_transform(np.asarray(pred)[:, :, None])
    )[:, :, 0]
    np.testing.assert_allclose(np.asarray(up), manual, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sample["y"]),
        np.moveaxis(batch["output_fields"][:, 0], -1, 1),
        rtol=1e-4,
    )


def test_spatiotemporal_mode_keeps_time_axis():
    rng = np.random.RandomState(2)
    batch = _well_batch(rng, n_out_steps=2)
    dp = TheWellDataProcessor(
        n_steps_input=T_IN, n_steps_output=2, time_as_channels=False
    )
    out = dp.preprocess(dict(batch), train=True)
    assert out["x"].shape == (B, C + CC, T_IN, RES, RES)
    assert out["y"].shape == (B, C, 2, RES, RES)
    # constants repeated along time
    np.testing.assert_allclose(
        np.asarray(out["x"][:, C:, 0]),
        np.asarray(out["x"][:, C:, 1]),
        rtol=1e-6,
    )


def test_time_as_channels_requires_single_output_step():
    with pytest.raises(ValueError):
        TheWellDataProcessor(n_steps_output=2, time_as_channels=True)


def test_ar_feedback_shifts_window_and_keeps_constants():
    rng = np.random.RandomState(3)
    batch = _well_batch(rng, with_const=True, trajectory=True,
                        n_out_steps=3)
    data_n, const_n = _normalizers()
    dp = TheWellDataProcessor(
        data_normalizer=data_n, const_normalizer=const_n,
        n_steps_input=T_IN,
    )
    fmt = dp.format_rollout_batch(dict(batch))
    assert fmt["x"].shape == (B, T_IN * C + CC, RES, RES)
    # targets: raw trajectory steps after the input window, channels-first
    assert fmt["y"].shape == (B, 3, C, RES, RES)
    np.testing.assert_allclose(
        np.asarray(fmt["y"][:, 0]),
        np.moveaxis(batch["output_fields"][:, T_IN], -1, 1),
        rtol=1e-6,
    )

    pred = jnp.asarray(rng.randn(B, C, RES, RES).astype(np.float32))
    nxt = dp.ar_feedback(fmt["x"], pred)
    assert nxt.shape == fmt["x"].shape
    # oldest step dropped: new channel block 0 == old block 1
    np.testing.assert_allclose(
        np.asarray(nxt[:, :C]), np.asarray(fmt["x"][:, C : 2 * C]),
        rtol=1e-6,
    )
    # newest block is the NORMALIZED prediction
    manual = np.asarray(data_n.transform(np.asarray(pred)[:, :, None]))[
        :, :, 0
    ]
    np.testing.assert_allclose(
        np.asarray(nxt[:, C : 2 * C]), manual, rtol=1e-5
    )
    # constants unchanged
    np.testing.assert_allclose(
        np.asarray(nxt[:, 2 * C :]), np.asarray(fmt["x"][:, 2 * C :]),
        rtol=1e-6,
    )


def test_trainer_end_to_end_train_and_autoregressive_eval():
    """A stub-schema the_well batch rolls through Trainer training AND
    scan-based autoregressive eval (VERDICT round-4 #6 'Done' bar)."""
    rng = np.random.RandomState(4)
    n = 8
    data_n, const_n = _normalizers()
    train_items = [
        {
            "input_fields": rng.randn(T_IN, RES, RES, C).astype(np.float32),
            "output_fields": rng.randn(1, RES, RES, C).astype(np.float32),
            "constant_fields": rng.randn(RES, RES, CC).astype(np.float32),
        }
        for _ in range(n)
    ]
    traj_items = [
        {
            "output_fields": rng.randn(T_IN + 3, RES, RES, C).astype(
                np.float32
            ),
            "constant_fields": rng.randn(RES, RES, CC).astype(np.float32),
        }
        for _ in range(n)
    ]
    dp = TheWellDataProcessor(
        data_normalizer=data_n, const_normalizer=const_n,
        n_steps_input=T_IN, n_steps_rollout=2,
    )
    model = FNO(
        n_modes=(4, 4), in_channels=T_IN * C + CC, out_channels=C,
        hidden_channels=8, n_layers=1,
    )
    trainer = Trainer(model=model, n_epochs=2, data_processor=dp,
                      eval_interval=10)
    l2 = LpLoss(d=2)
    metrics = trainer.train(
        DataLoader(DictDataset(train_items), batch_size=4, shuffle=True),
        {},
        adamw(1e-3),
        training_loss=l2,
    )
    assert np.isfinite(metrics["train_err"])

    vals = trainer.evaluate(
        eval_step=None,
        loader=DataLoader(DictDataset(traj_items), batch_size=4),
        prefix="well",
        mode="autoregression",
        eval_losses={"l2": l2},
    )
    assert np.isfinite(vals["well_l2"])
    # horizon capped by the processor's n_steps_rollout
    assert trainer._last_rollout_T == 2
