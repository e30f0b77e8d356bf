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
