"""Meta-losses, equation losses, incremental trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.losses import (
    BurgersEqnLoss,
    ICLoss,
    LpLoss,
    Relobralo,
    SoftAdapt,
    WeightedSumLoss,
)


def test_weighted_sum_loss():
    l2 = LpLoss(d=1)
    w = WeightedSumLoss([l2, l2], weights=[0.25, 0.75])
    x = jnp.ones((2, 1, 8))
    y = jnp.zeros_like(x)
    np.testing.assert_allclose(float(w(x, y)), float(l2(x, y)), rtol=1e-6)


def test_softadapt_weights():
    agg = SoftAdapt(num_losses=2)
    losses = {"a": jnp.asarray(1.0), "b": jnp.asarray(2.0)}
    total0, lam0 = agg(losses, step=0)
    assert np.isclose(float(total0), 3.0)
    np.testing.assert_allclose(np.asarray(lam0), [1.0, 1.0])
    # increasing 'b' relative to previous value gets higher weight
    losses = {"a": jnp.asarray(0.5), "b": jnp.asarray(4.0)}
    total1, lam1 = agg(losses, step=1)
    assert float(lam1[1]) > float(lam1[0])
    assert np.isfinite(float(total1))


def test_relobralo_runs():
    agg = Relobralo(num_losses=2)
    for step in range(3):
        losses = {"a": jnp.asarray(1.0 / (step + 1)), "b": jnp.asarray(2.0)}
        total, lam = agg(losses, step=step)
        assert np.isfinite(float(total))
    assert lam.shape == (2,)


def test_burgers_eqn_loss_zero_for_steady_solution():
    """A constant field solves Burgers exactly -> zero residual."""
    u = jnp.ones((2, 1, 8, 16)) * 3.0
    loss = BurgersEqnLoss(visc=0.01)
    assert float(loss(u)) < 1e-10


def test_ic_loss():
    y_pred = jnp.zeros((2, 1, 4, 8))
    y = jnp.ones((2, 1, 4, 8))
    assert np.isclose(float(ICLoss()(y_pred, y)), 1.0)


def test_incremental_trainer_loss_gap():
    from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import IncrementalFNOTrainer, adamw

    rng = np.random.RandomState(0)
    x = rng.randn(16, 1, 16, 16).astype(np.float32)
    y = (x * 2).astype(np.float32)
    ds = TensorDataset(x, y)
    loader = DataLoader(ds, batch_size=8)
    model = FNO(
        n_modes=(4, 4),
        max_n_modes=(8, 8),
        in_channels=1,
        out_channels=1,
        hidden_channels=8,
        n_layers=2,
    )
    trainer = IncrementalFNOTrainer(
        model=model,
        n_epochs=4,
        incremental_loss_gap=True,
        incremental_loss_eps=1e9,  # force growth each epoch
        starting_n_modes=(2, 2),
    )
    trainer.train(loader, {"t": DataLoader(ds, batch_size=8)}, adamw(1e-3))
    assert trainer.current_n_modes[0] > 2  # modes actually grew
