"""Optimizer and LR-schedule factories.

JAX/optax counterpart of reference ``neuralop/training/adamw.py`` and the
torch schedulers used by its scripts. Tensor-GaLore (low-rank gradient
projection) is layered on top as an optax transform.
"""

from typing import Optional

import optax


def step_lr(base_lr: float, step_size: int, gamma: float = 0.5,
            steps_per_epoch: int = 1) -> optax.Schedule:
    """torch.optim.lr_scheduler.StepLR equivalent (per-epoch decay)."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size * steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )


def cosine_annealing(base_lr: float, t_max: int, steps_per_epoch: int = 1):
    return optax.cosine_decay_schedule(base_lr, t_max * steps_per_epoch)


def adamw(
    learning_rate,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (reference ``training/adamw.py:11``)."""
    tx = optax.adamw(
        learning_rate=learning_rate,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


class StepLR:
    """Per-epoch stepped LR decay honored by ``Trainer.train(scheduler=...)``.

    torch.optim.lr_scheduler.StepLR equivalent for the epoch-scheduler
    protocol (reference trainer steps its scheduler once per epoch,
    ``/root/reference/neuralop/training/trainer.py:296-310``): the Trainer
    calls ``step()`` after every epoch and multiplies optimizer updates by
    ``factor``, which equals ``gamma ** (epoch // step_size)``.

    Use this when the optimizer was built with a constant base LR; if the
    schedule is already folded into the optimizer (optax.Schedule), pass
    ``scheduler=None``.
    """

    needs_metric = False

    def __init__(self, step_size: int, gamma: float = 0.5):
        self.step_size = int(step_size)
        self.gamma = float(gamma)
        self.epoch = 0
        self.factor = 1.0

    def step(self, metric=None) -> None:
        self.epoch += 1
        self.factor = self.gamma ** (self.epoch // self.step_size)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "factor": self.factor}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        self.factor = float(state["factor"])


class ReduceLROnPlateau:
    """Epoch-scheduler protocol version of ReduceLROnPlateau.

    The Trainer calls ``step(train_err)`` after each epoch (the reference's
    ReduceLROnPlateau branch, trainer.py:307-310) and scales updates by
    ``factor``. For a fully-on-device variant fold
    :func:`reduce_on_plateau` into the optimizer instead.
    """

    needs_metric = True

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-4, min_lr_factor: float = 0.0):
        self.reduction = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.min_factor = float(min_lr_factor)
        self.best = float("inf")
        self.bad_epochs = 0
        self.factor = 1.0

    def step(self, metric) -> None:
        metric = float(metric)
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.factor = max(
                    self.factor * self.reduction, self.min_factor
                )
                self.bad_epochs = 0

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "bad_epochs": self.bad_epochs,
            "factor": self.factor,
        }

    def load_state_dict(self, state: dict) -> None:
        self.best = float(state["best"])
        self.bad_epochs = int(state["bad_epochs"])
        self.factor = float(state["factor"])


def reduce_on_plateau(
    optimizer: optax.GradientTransformation,
    factor: float = 0.5,
    patience: int = 5,
    atol: float = 0.0,
    rtol: float = 1e-4,
) -> optax.GradientTransformation:
    """Wrap an optimizer with ReduceLROnPlateau scheduling.

    torch.optim.lr_scheduler.ReduceLROnPlateau equivalent (the reference
    Trainer supports it, trainer.py:296-310). The wrapped optimizer's
    ``update`` accepts ``value=<metric>``; the Trainer passes the training
    loss automatically when it detects the wrapper.
    """
    wrapped = optax.chain(
        optimizer,
        optax.contrib.reduce_on_plateau(
            factor=factor, patience=patience, atol=atol, rtol=rtol
        ),
    )
    wrapped.needs_value = True  # Trainer protocol flag
    return wrapped
