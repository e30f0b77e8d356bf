"""Trainer integration: training reduces loss, checkpoint/resume roundtrip.

Mirrors reference training/tests/test_trainer.py with a small FNO instead of
the DummyModel (our train step is jitted end-to-end).
"""

import numpy as np
import pytest

from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw, step_lr


def _toy_problem(n=32, res=8):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 1, res, res).astype(np.float32)
    # target: smoothed input (a simple linear operator an FNO can learn)
    y = np.roll(x, 1, axis=-1) + 0.5 * x
    return TensorDataset(x, y)


def _small_model():
    return FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=2,
    )


def test_training_reduces_loss(tmp_path):
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8, shuffle=True)
    test_loader = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    trainer = Trainer(model=model, n_epochs=5, eval_interval=5)
    l2 = LpLoss(d=2)
    opt = adamw(1e-2)
    metrics = trainer.train(
        loader, test_loader, opt, training_loss=l2, eval_losses={"l2": l2}
    )
    first = Trainer(model=model, n_epochs=1, eval_interval=1)
    m0 = first.train(loader, test_loader, adamw(0.0), training_loss=l2,
                     eval_losses={"l2": l2})
    assert metrics["8_l2"] < m0["8_l2"]


def test_checkpoint_resume_roundtrip(tmp_path):
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    save_dir = tmp_path / "ckpt"

    trainer = Trainer(model=model, n_epochs=3)
    trainer.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
    )
    assert (save_dir / "model.msgpack").exists()
    assert (save_dir / "optimizer.msgpack").exists()
    assert (save_dir / "manifest.json").exists()

    params_before = trainer.params

    resumed = Trainer(model=model, n_epochs=3)
    resumed.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, resume_from_dir=save_dir,
    )
    # resume starts from saved epoch -> start_epoch == 3 -> no extra training
    assert resumed.start_epoch == 3
    for a, b in zip(jax_leaves(params_before), jax_leaves(resumed.params)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def jax_leaves(tree):
    import jax

    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(tree)]


def test_warm_start_params_only(tmp_path):
    """warm_start_from loads weights but keeps fresh optimizer/epoch."""
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    save_dir = tmp_path / "src"

    src = Trainer(model=model, n_epochs=2, eval_interval=1)
    src.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_best="8_l2", save_dir=save_dir,
    )

    # lr=0 fine-tune: params must equal the SOURCE's best checkpoint
    ft = Trainer(model=model, n_epochs=1)
    ft.train(
        loader, test_loaders, adamw(0.0), training_loss=l2,
        eval_losses={"l2": l2}, warm_start_from=save_dir,
    )
    # epoch counter is fresh (unlike resume)
    assert ft.start_epoch == 0
    from neuraloperator_tpu.training import load_training_state

    best, _, _ = load_training_state(save_dir, "best_model", ft.params)
    for a, b in zip(jax_leaves(best), jax_leaves(ft.params)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_warm_start_opt_state(tmp_path):
    """warm_start_opt=True restores the donor's optimizer statistics.

    Same-distribution fine-tunes should start from the donor's Adam
    moments to avoid the warm-restart bump (BASELINE.md round-5 v3c);
    a missing/mismatched donor state falls back to fresh with a warning.
    """
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    save_dir = tmp_path / "src"

    src = Trainer(model=model, n_epochs=2, eval_interval=2)
    src.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
    )

    # n_epochs=0: pure state-loading pass, nothing trains afterwards
    ft = Trainer(model=model, n_epochs=0)
    ft.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, warm_start_from=save_dir,
        warm_start_name="model", warm_start_opt=True,
    )
    assert ft.start_epoch == 0  # still a warm start, not a resume
    for a, b in zip(jax_leaves(src.opt_state), jax_leaves(ft.opt_state)):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    # donor without an optimizer checkpoint: warn + fresh state
    (save_dir / "optimizer.msgpack").unlink()
    ft2 = Trainer(model=model, n_epochs=0)
    with pytest.warns(UserWarning, match="warm_start_opt"):
        ft2.train(
            loader, test_loaders, adamw(1e-3), training_loss=l2,
            eval_losses={"l2": l2}, warm_start_from=save_dir,
            warm_start_name="model", warm_start_opt=True,
        )


def test_save_best(tmp_path):
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {"test": DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    trainer = Trainer(model=model, n_epochs=2, eval_interval=1)
    trainer.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_best="test_l2", save_dir=tmp_path / "best",
    )
    assert (tmp_path / "best" / "best_model.msgpack").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    import chex
    import jax
    import jax.numpy as jnp
    import optax

    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training.training_state import (
        load_training_state_orbax,
        save_training_state_orbax,
    )

    m = FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
            hidden_channels=8, n_layers=1)
    x = jnp.ones((1, 1, 8, 8))
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    opt = optax.adamw(1e-3)
    s = opt.init(p)
    save_training_state_orbax(tmp_path, p, s, epoch=7, async_save=True)
    p2, s2, ep = load_training_state_orbax(
        tmp_path, jax.tree_util.tree_map(jnp.zeros_like, p), s
    )
    assert ep == 7
    chex.assert_trees_all_close(p, p2)


def test_mixed_precision_training():
    """bf16 mixed precision trains to ~the same loss as f32."""
    rng = np.random.RandomState(0)
    x = rng.randn(32, 1, 16, 16).astype(np.float32)
    ds = TensorDataset(x, 2 * x)
    results = {}
    for mp in (False, True):
        model = FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
                    hidden_channels=8, n_layers=2)
        trainer = Trainer(model=model, n_epochs=4, mixed_precision=mp)
        metrics = trainer.train(
            DataLoader(ds, 8), {"t": DataLoader(ds, 8)}, adamw(3e-3),
            training_loss=LpLoss(d=2), eval_losses={"l2": LpLoss(d=2)},
        )
        results[mp] = metrics["t_l2"]
    assert np.isfinite(results[True])
    # bf16 master-weight training should land within a few percent of f32
    assert abs(results[True] - results[False]) / results[False] < 0.1


def test_wandb_log_output_image(monkeypatch):
    """log_output=True attaches an eval-output image to the wandb payload."""
    import sys
    import types

    logged = {}
    stub = types.ModuleType("wandb")

    class _Img:
        def __init__(self, arr):
            self.shape = np.asarray(arr).shape

    stub.Image = _Img
    stub.log = lambda payload, step=None: logged.setdefault(step, payload)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    rng = np.random.RandomState(0)
    x = rng.randn(16, 1, 8, 8).astype(np.float32)
    ds = TensorDataset(x, 2 * x)
    model = FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=1)
    trainer = Trainer(model=model, n_epochs=1, wandb_log=True,
                      log_output=True)
    trainer.train(
        DataLoader(ds, 8), {"t": DataLoader(ds, 8)}, adamw(1e-3),
        training_loss=LpLoss(d=2), eval_losses={"l2": LpLoss(d=2)},
    )
    assert "eval_output" in logged[0]
    assert logged[0]["eval_output"].shape == (8, 8)
    assert "t_l2" in logged[0]


def test_autoregression_horizon_from_processor():
    """n_steps_rollout on the data processor caps the rollout length."""
    import jax
    import jax.numpy as jnp

    from neuraloperator_tpu.data.transforms import TheWellDataProcessor

    model = FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=1)
    x = np.random.RandomState(0).randn(2, 1, 8, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(2, 5, 1, 8, 8).astype(np.float32)

    dp = TheWellDataProcessor(n_steps_rollout=2)
    trainer = Trainer(model=model, n_epochs=1, data_processor=dp)
    trainer.params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x)
    )["params"]
    vals = trainer._eval_autoregressive(
        {"x": jnp.asarray(x), "y": jnp.asarray(y)},
        {"l2": lambda out, t: jnp.mean((out - t) ** 2)}, None,
    )
    # horizon comes from the processor, not y's 5 steps
    assert trainer._last_rollout_T == 2
    assert np.isfinite(vals["l2"])


def test_scheduler_changes_lr_trajectory():
    """StepLR actually scales updates: with gamma=0 the params freeze after
    step_size epochs (reference steps its scheduler per epoch,
    trainer.py:296-310)."""
    import jax

    from neuraloperator_tpu.training.optimizer import StepLR

    ds = _toy_problem(n=16)
    loader = DataLoader(ds, batch_size=8)
    test_loader = {8: DataLoader(ds, batch_size=8)}
    l2 = LpLoss(d=2)

    model = _small_model()
    trainer = Trainer(model=model, n_epochs=1, eval_interval=10)
    trainer.train(loader, test_loader, adamw(1e-2), training_loss=l2,
                  eval_losses={"l2": l2})
    params_before = jax.device_get(trainer.params)

    # continue 2 more epochs with a scheduler that zeroes the LR immediately
    sched = StepLR(step_size=1, gamma=0.0)
    sched.step()  # factor -> 0 from the first continued epoch
    assert sched.factor == 0.0
    trainer.n_epochs = 1
    trainer.train(loader, test_loader, adamw(1e-2), scheduler=sched,
                  training_loss=l2, eval_losses={"l2": l2})
    params_after = jax.device_get(trainer.params)
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(params_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_lr_decay_schedule():
    from neuraloperator_tpu.training.optimizer import StepLR

    s = StepLR(step_size=2, gamma=0.5)
    factors = []
    for _ in range(6):
        s.step()
        factors.append(s.factor)
    assert factors == [1.0, 0.5, 0.5, 0.25, 0.25, 0.125]


def test_reduce_lr_on_plateau_epoch_protocol():
    from neuraloperator_tpu.training.optimizer import ReduceLROnPlateau

    s = ReduceLROnPlateau(factor=0.5, patience=1)
    s.step(1.0)   # best=1.0
    s.step(1.0)   # bad 1
    assert s.factor == 1.0
    s.step(1.0)   # bad 2 > patience -> reduce
    assert s.factor == 0.5
    s.step(0.5)   # improvement resets
    s.step(0.5)
    assert s.factor == 0.5


def test_regularizer_applied():
    """An L2 params penalty changes the reported loss and the updates."""
    import jax

    ds = _toy_problem(n=16)
    loader = DataLoader(ds, batch_size=8)
    test_loader = {8: DataLoader(ds, batch_size=8)}
    l2 = LpLoss(d=2)

    def reg(params):
        import jax.numpy as jnp

        return 1e3 * sum(
            jnp.sum(p.astype(jnp.float32) ** 2)
            for p in jax.tree_util.tree_leaves(params)
        )

    model = _small_model()
    t_plain = Trainer(model=model, n_epochs=1, eval_interval=10)
    m_plain = t_plain.train(loader, test_loader, adamw(1e-3),
                            training_loss=l2, eval_losses={"l2": l2})
    t_reg = Trainer(model=model, n_epochs=1, eval_interval=10)
    m_reg = t_reg.train(loader, test_loader, adamw(1e-3), regularizer=reg,
                        training_loss=l2, eval_losses={"l2": l2})
    assert m_reg["train_err"] > m_plain["train_err"] + 1.0


def _toy_trajectory_problem(n=24, res=8, horizon=3):
    """Windows from a linear 'dynamics': w_{t+1} = roll(w_t) * 0.9."""
    rng = np.random.RandomState(1)
    w = rng.randn(n, horizon + 1, res, res).astype(np.float32)
    for t in range(1, horizon + 1):
        w[:, t] = 0.9 * np.roll(w[:, t - 1], 1, axis=-1)
    from neuraloperator_tpu.data.datasets.ns_solver import (
        trajectories_to_windows,
    )

    x, y = trajectories_to_windows(w, horizon)
    assert x.shape == (n, 1, res, res)
    assert y.shape == (n, horizon, 1, res, res)
    return TensorDataset(x, y)


@pytest.mark.parametrize("pushforward", [True, False])
def test_rollout_training_reduces_loss(pushforward):
    horizon = 3
    ds = _toy_trajectory_problem(horizon=horizon)
    loader = DataLoader(ds, batch_size=8, shuffle=True)
    model = _small_model()
    l2 = LpLoss(d=2)

    def run(n_epochs, lr):
        trainer = Trainer(model=model, n_epochs=n_epochs, eval_interval=100)
        trainer.train(
            loader, {}, adamw(lr), training_loss=l2,
            rollout_steps=horizon, pushforward=pushforward,
        )
        return trainer

    base = run(1, 0.0)
    trained = run(8, 1e-2)

    # rollout-eval both with the autoregression path
    def rollout_l2(trainer):
        vals = trainer.evaluate(
            None, loader, prefix="t", mode="autoregression",
            eval_losses={"l2": l2},
        )
        return vals["t_l2"]

    assert rollout_l2(trained) < rollout_l2(base)


def test_rollout_training_single_step_y_raises():
    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    trainer = Trainer(model=_small_model(), n_epochs=1)
    with pytest.raises(Exception):
        trainer.train(
            loader, {}, adamw(1e-3), training_loss=LpLoss(d=2),
            rollout_steps=3,
        )


def test_device_dataset_epoch_scan_matches_loop():
    """device_dataset=True (one scan program per epoch) trains to a loss
    comparable to the per-batch loop and is deterministic."""
    ds = _toy_problem()
    l2 = LpLoss(d=2)

    def run(device_dataset):
        # device_dataset shuffles on-device via shuffle_seed; stage from an
        # unshuffled loader so runs are reproducible
        loader = DataLoader(ds, batch_size=8, shuffle=not device_dataset)
        model = _small_model()
        trainer = Trainer(model=model, n_epochs=6, eval_interval=100)
        trainer.train(
            loader, {}, adamw(1e-2), training_loss=l2,
            device_dataset=device_dataset, shuffle_seed=7,
        )
        ev = trainer._build_eval_step({"l2": l2})
        test_loader = DataLoader(ds, batch_size=8)
        return trainer.evaluate(ev, test_loader, prefix="t")["t_l2"]

    scan_loss = run(True)
    loop_loss = run(False)
    assert scan_loss < 0.85  # improved from ~1.0 at init
    assert abs(scan_loss - loop_loss) / loop_loss < 0.15
    assert run(True) == scan_loss  # deterministic


def test_rollout_training_feedback_bridges_normalizers():
    """With distinct in/out normalizers, rollout training feeds predictions
    back through DefaultDataProcessor.feedback (decode y-space, encode
    x-space); training converges on an identity-dynamics trajectory."""
    import jax.numpy as jnp

    from neuraloperator_tpu.data.transforms import (
        DefaultDataProcessor, UnitGaussianNormalizer,
    )

    horizon = 3
    rng = np.random.RandomState(3)
    n, res = 32, 8
    base = rng.randn(n, 1, res, res).astype("float32")
    # constant-in-time trajectories with different x/y affine frames
    x = 2.0 * base + 1.0
    y = np.repeat((0.5 * base - 2.0)[:, None], horizon, axis=1)
    ds = TensorDataset(x=x, y=y)
    loader = DataLoader(ds, batch_size=8, shuffle=True)

    in_norm = UnitGaussianNormalizer()
    in_norm.fit(x)
    out_norm = UnitGaussianNormalizer()
    out_norm.fit(y[:, 0])
    dp = DefaultDataProcessor(in_normalizer=in_norm, out_normalizer=out_norm)

    # feedback maps an encoded-y value to the encoded-x frame exactly
    probe = jnp.asarray(out_norm.transform(0.5 * base[:2] - 2.0))
    fed = np.asarray(dp.feedback(probe))
    np.testing.assert_allclose(
        fed, np.asarray(in_norm.transform(0.5 * base[:2] - 2.0)),
        rtol=1e-5, atol=1e-5,
    )

    def run(n_epochs, lr):
        trainer = Trainer(
            model=_small_model(), n_epochs=n_epochs, eval_interval=100,
            data_processor=dp,
        )
        return trainer.train(
            loader, {}, adamw(lr), training_loss=LpLoss(d=2),
            rollout_steps=horizon, pushforward=True,
        )["train_err"]

    base = run(1, 0.0)
    trained = run(12, 5e-3)
    assert trained < 0.6 * base  # learns the map through feedback


def test_device_dataset_h1_ynorm_precompute_matches_loop():
    """With an H1 training loss, the device-dataset path precomputes the
    rel-denominator per sample (one FD pass per step on the difference);
    the training trajectory must match the per-batch loop path."""
    from neuraloperator_tpu.losses import H1Loss

    ds = _toy_problem()
    h1 = H1Loss(d=2)

    def run(device_dataset):
        loader = DataLoader(ds, batch_size=8, shuffle=not device_dataset)
        model = _small_model()
        trainer = Trainer(model=model, n_epochs=3, eval_interval=100)
        trainer.train(
            loader, {}, adamw(1e-2), training_loss=h1,
            device_dataset=device_dataset, shuffle_seed=7,
        )
        ev = trainer._build_eval_step({"h1": h1})
        test_loader = DataLoader(ds, batch_size=8)
        return trainer.evaluate(ev, test_loader, prefix="t")["t_h1"]

    scan_loss = run(True)
    loop_loss = run(False)
    # different shuffles, same optimization problem: close final losses
    assert abs(scan_loss - loop_loss) / loop_loss < 0.15


def test_resume_preserves_stored_best(tmp_path):
    """A resumed run must not overwrite best_model with its first
    (worse) eval: the manifest carries best_metric/best_epoch, and the
    best save never clobbers the periodic save's resume epoch."""
    import json

    ds = _toy_problem()
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    save_dir = tmp_path / "ckpt"

    trainer = Trainer(model=model, n_epochs=2, eval_interval=1)
    trainer.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
        save_best="8_l2",
    )
    manifest = json.loads((save_dir / "manifest.json").read_text())
    # periodic epoch key and best_* keys coexist
    assert manifest["epoch"] == 1
    assert manifest["best_key"] == "8_l2"
    assert np.isfinite(manifest["best_metric"])
    assert 0 <= manifest["best_epoch"] <= 1

    # pretend the interrupted run had already found an unbeatable best
    manifest["best_metric"] = 1e-12
    (save_dir / "manifest.json").write_text(json.dumps(manifest))
    best_bytes = (save_dir / "best_model.msgpack").read_bytes()

    resumed = Trainer(model=model, n_epochs=4, eval_interval=1)
    resumed.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
        save_best="8_l2", resume_from_dir=save_dir,
    )
    # stored best untouched (no eval beat 1e-12)...
    assert (save_dir / "best_model.msgpack").read_bytes() == best_bytes
    # ...and the manifest still records the unbeaten metric while the
    # resume epoch advanced with the periodic saves
    manifest = json.loads((save_dir / "manifest.json").read_text())
    assert manifest["best_metric"] == 1e-12
    assert manifest["epoch"] == 3


def test_epoch_scan_chunk_matches_unchunked():
    """epoch_scan_chunk splits an epoch into equal sub-programs that
    replay the SAME shuffled batch order, so (divisible case) the
    parameter trajectory matches the single-program epoch exactly."""
    import jax

    ds = _toy_problem()  # 32 samples -> 4 batches of 8
    l2 = LpLoss(d=2)

    def run(chunk):
        loader = DataLoader(ds, batch_size=8, shuffle=False)
        model = _small_model()
        trainer = Trainer(model=model, n_epochs=3, eval_interval=100)
        trainer.train(
            loader, {}, adamw(1e-2), training_loss=l2,
            device_dataset=True, epoch_scan_chunk=chunk, shuffle_seed=7,
        )
        return trainer.params

    p_whole = run(None)
    p_chunked = run(2)  # 4 batches -> 2 programs of 2 steps
    for a, b in zip(
        jax.tree_util.tree_leaves(p_whole),
        jax.tree_util.tree_leaves(p_chunked),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_epoch_scan_chunk_drop_last():
    """Non-divisible chunking drops trailing batches but still trains."""
    ds = _toy_problem(n=40)  # 5 batches of 8 -> chunk 2 => 2x2, drop 1
    l2 = LpLoss(d=2)
    loader = DataLoader(ds, batch_size=8, shuffle=False)
    model = _small_model()
    trainer = Trainer(model=model, n_epochs=6, eval_interval=100)
    trainer.train(
        loader, {}, adamw(1e-2), training_loss=l2,
        device_dataset=True, epoch_scan_chunk=2, shuffle_seed=7,
    )
    ev = trainer._build_eval_step({"l2": l2})
    test_loader = DataLoader(ds, batch_size=8)
    assert trainer.evaluate(ev, test_loader, prefix="t")["t_l2"] < 0.85


def test_data_processor_sidecar_roundtrip(tmp_path):
    """Trainer persists fitted normalizer stats with the checkpoint, and
    load_data_processor reconstructs a processor that evaluates the
    checkpoint identically — without refitting the train pipeline
    (guards the v2/v3 eval-mismatch bug: a normalizer refit from a
    different split shifts flagship-scale eval numbers)."""
    import jax
    import jax.numpy as jnp

    from neuraloperator_tpu.data.transforms import (
        DefaultDataProcessor,
        UnitGaussianNormalizer,
        load_data_processor,
    )

    ds = _toy_problem()
    x = np.stack([np.asarray(s["x"]) for s in ds])
    y = np.stack([np.asarray(s["y"]) for s in ds])
    dp = DefaultDataProcessor(
        in_normalizer=UnitGaussianNormalizer(dim=[0, 2, 3]).fit(x),
        out_normalizer=UnitGaussianNormalizer(dim=[0, 2, 3]).fit(y),
    )
    loader = DataLoader(ds, batch_size=8)
    test_loaders = {8: DataLoader(ds, batch_size=8)}
    model = _small_model()
    l2 = LpLoss(d=2)
    save_dir = tmp_path / "ckpt"

    trainer = Trainer(model=model, n_epochs=1, data_processor=dp)
    trainer.train(
        loader, test_loaders, adamw(1e-3), training_loss=l2,
        eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
    )
    assert (save_dir / "data_processor.json").exists()

    dp2 = load_data_processor(save_dir)
    assert isinstance(dp2, DefaultDataProcessor)
    np.testing.assert_allclose(
        dp2.in_normalizer.mean, dp.in_normalizer.mean, rtol=1e-6
    )
    np.testing.assert_allclose(
        dp2.out_normalizer.std, dp.out_normalizer.std, rtol=1e-6
    )

    # eval-equivalence: saved-processor pipeline == original pipeline
    xb = jnp.asarray(x[:8])

    def forward(proc):
        sample = proc.preprocess({"x": xb}, train=False)
        out = model.apply({"params": trainer.params}, sample["x"])
        out, _ = proc.postprocess(out, sample, train=False)
        return np.asarray(out)

    np.testing.assert_allclose(forward(dp2), forward(dp), rtol=1e-6)

    # missing sidecar -> None (pre-sidecar checkpoints fall back)
    assert load_data_processor(tmp_path / "nonexistent") is None
