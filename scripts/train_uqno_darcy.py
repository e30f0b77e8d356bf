"""Train a UQNO (uncertainty-quantified NO) on Darcy flow, with calibration.

Counterpart of /root/reference/scripts/train_uqno_darcy.py: the training
set is split into (solution, residual, calibration) subsets; a base
solution FNO is trained first, then frozen while a residual model is
trained with the pointwise quantile loss on |y - base(x)|; finally the
predicted band is *conformally calibrated* on the held-out calibration
split (reference :595-782): pick the domain-level and function-level
quantile indices from concentration bounds, take the corresponding top-k
of the |error|/band ratios, and scale the band by that factor. The
guarantee: with prob >= 1-delta over functions, >= 1-alpha of grid points
fall inside the scaled band.
"""

import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import LpLoss, PointwiseQuantileLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw, setup


@dataclass
class UQNOConfig(ConfigBase):
    n_train: int = 1000
    n_train_solution: int = 600
    n_train_residual: int = 250
    n_calib_residual: int = 150
    base_epochs: int = 30
    residual_epochs: int = 30
    alpha: float = 0.1  # target pointwise miscoverage
    delta: float = 0.05  # target function-level miscoverage
    learning_rate: float = 5e-3
    verbose: bool = True
    resolution: int = 16  # >16: synthetic Darcy at this grid size (the
    # in-domain concentration bound ~ 1/sqrt(n_gridpts) tightens the
    # calibrated band with resolution; see BASELINE.md)


def get_coeff_quantile_idx(alpha, delta, n_samples, n_gridpts):
    """Quantile indices for conformal calibration (reference :596-645).

    Balances the in-domain concentration bound (over grid points) against
    the across-function bound (over calibration samples).
    """
    lb = np.sqrt(-np.log(delta) / 2 / n_gridpts)
    t = (alpha - lb) / 3 + lb
    percentile = alpha - t
    domain_idx = int(np.ceil(percentile * n_gridpts))
    function_percentile = (
        np.ceil((n_samples + 1) * (delta - np.exp(-2 * n_gridpts * t * t)))
        / n_samples
    )
    function_idx = int(np.ceil(function_percentile * n_samples))
    return domain_idx, function_idx


def main():
    config = make_config_from_cli(UQNOConfig)
    setup()
    train_loader, test_loaders, dp = load_darcy_flow_small(
        n_train=config.n_train, n_tests=[100], batch_size=16,
        test_batch_sizes=[16], test_resolutions=[config.resolution],
        train_resolution=config.resolution,
    )

    # materialize the train split and carve it into solution/residual/calib
    xs, ys = [], []
    for batch in train_loader:
        xs.append(np.asarray(batch["x"]))
        ys.append(np.asarray(batch["y"]))
    x_all, y_all = np.concatenate(xs), np.concatenate(ys)
    n_sol, n_res = config.n_train_solution, config.n_train_residual
    n_cal = config.n_calib_residual
    x_sol, y_sol = x_all[:n_sol], y_all[:n_sol]
    x_res, y_res = x_all[n_sol : n_sol + n_res], y_all[n_sol : n_sol + n_res]
    x_cal = x_all[n_sol + n_res : n_sol + n_res + n_cal]
    y_cal = y_all[n_sol + n_res : n_sol + n_res + n_cal]

    from neuraloperator_tpu.data.datasets.tensor_dataset import (
        DataLoader, TensorDataset,
    )

    sol_loader = DataLoader(TensorDataset(x_sol, y_sol), 16, shuffle=True)

    # 1. train the base solution model
    base = FNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=24
    )
    l2 = LpLoss(d=2)
    base_trainer = Trainer(
        model=base, n_epochs=config.base_epochs, data_processor=dp,
        verbose=config.verbose, eval_interval=10,
    )
    base_trainer.train(
        sol_loader, test_loaders, adamw(config.learning_rate),
        training_loss=l2, eval_losses={"l2": l2},
    )
    base_params = base_trainer.params

    # frozen base forward in RAW space (preprocess -> model -> postprocess)
    @jax.jit
    def base_predict(x_raw):
        sample = dp.preprocess({"x": x_raw, "y": x_raw}, train=False)
        out = base.apply({"params": base_params}, sample["x"])
        out, _ = dp.postprocess(out, sample, train=False)
        return out

    def batched_base_predict(x, bs=16):
        return np.concatenate(
            [np.asarray(base_predict(jnp.asarray(x[i : i + bs])))
             for i in range(0, len(x), bs)]
        )

    # 2. residual (quantile band) model on |y - base(x)|, trained in
    # error-std units so the quantile loss is well-scaled
    err_res = y_res - batched_base_predict(x_res)
    err_scale = float(np.abs(err_res).std()) + 1e-12

    residual = FNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=24
    )
    qloss = PointwiseQuantileLoss(alpha=config.alpha)

    res_params = jax.jit(residual.init)(
        jax.random.PRNGKey(1), jnp.asarray(x_res[:1])
    )["params"]
    opt = adamw(config.learning_rate)
    opt_state = opt.init(res_params)

    @jax.jit
    def step(res_params, opt_state, x_raw, err_scaled):
        sample = dp.preprocess({"x": x_raw, "y": err_scaled}, train=False)

        def loss_fn(p):
            pred = residual.apply({"params": p}, sample["x"])
            return qloss(pred, err_scaled)

        loss, grads = jax.value_and_grad(loss_fn)(res_params)
        updates, opt_state = opt.update(grads, opt_state, res_params)
        return optax.apply_updates(res_params, updates), opt_state, loss

    res_loader = DataLoader(
        TensorDataset(x_res, err_res / err_scale), 16, shuffle=True
    )
    for epoch in range(config.residual_epochs):
        losses = []
        for batch in res_loader:
            res_params, opt_state, loss = step(
                res_params, opt_state,
                jnp.asarray(batch["x"]), jnp.asarray(batch["y"]),
            )
            losses.append(float(loss))
        if config.verbose:
            print(f"[uq {epoch}] quantile loss {np.mean(losses):.5f}")

    @jax.jit
    def band_predict(x_raw):
        sample = dp.preprocess({"x": x_raw, "y": x_raw}, train=False)
        pred = residual.apply({"params": res_params}, sample["x"])
        return jnp.abs(pred) * err_scale  # back to raw error units

    def batched_band(x, bs=16):
        return np.concatenate(
            [np.asarray(band_predict(jnp.asarray(x[i : i + bs])))
             for i in range(0, len(x), bs)]
        )

    # 3. conformal calibration on the held-out calibration split
    err_cal = np.abs(y_cal - batched_base_predict(x_cal))
    band_cal = batched_band(x_cal)
    ratios = (err_cal / (band_cal + 1e-12)).reshape(len(x_cal), -1)
    n_gridpts = ratios.shape[1]
    domain_idx, function_idx = get_coeff_quantile_idx(
        config.alpha, config.delta, n_samples=len(x_cal), n_gridpts=n_gridpts
    )
    # domain_idx'th largest ratio per function, then function_idx'th largest
    per_fn = np.sort(ratios, axis=1)[:, -(domain_idx + 1)]
    scale = float(np.abs(np.sort(per_fn)[-(function_idx + 1)]))
    print(f"calibration: domain_idx={domain_idx} function_idx={function_idx} "
          f"scale={scale:.4f}")

    # 4. evaluate (alpha, delta) coverage + bandwidth on the test split
    xs, ys = [], []
    for batch in test_loaders[config.resolution]:
        xs.append(np.asarray(batch["x"]))
        ys.append(np.asarray(batch["y"]))
    x_t, y_t = np.concatenate(xs), np.concatenate(ys)
    err_t = np.abs(y_t - batched_base_predict(x_t))
    band_t = batched_band(x_t) * scale
    inside = (err_t <= band_t).reshape(len(x_t), -1)
    pointwise = inside.mean()
    fn_cov = (inside.mean(axis=1) >= 1 - config.alpha).mean()
    print(f"pointwise coverage: {pointwise:.3f} (target {1-config.alpha})")
    print(f"function coverage (>= {1-config.alpha} pts in-band): "
          f"{fn_cov:.3f} (target {1-config.delta})")
    print(f"mean band width: {band_t.mean():.5f}")
    return base_params, res_params, scale


if __name__ == "__main__":
    main()
