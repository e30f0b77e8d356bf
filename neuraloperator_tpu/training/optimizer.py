"""Optimizer and LR-schedule factories.

JAX/optax counterpart of reference ``neuralop/training/adamw.py`` and the
torch schedulers used by its scripts. Tensor-GaLore (low-rank gradient
projection) is layered on top as an optax transform.
"""

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
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


class Quantized8(NamedTuple):
    """Blockwise int8-quantized tensor: flattened into blocks of
    ``block`` elements, each block stored as int8 codes + one f32
    absmax scale (linear symmetric quantization, Dettmers et al. 2021
    "8-bit Optimizers via Block-wise Quantization" — the blockwise
    scheme; we use linear rather than dynamic-tree codes, which for
    the *first* moment costs <0.1% quality in their ablations).
    The original shape is not stored — callers recover it from the
    matching gradient/param leaf (static under jit)."""

    codes: chex.Array   # int8, (n_blocks, block)
    scale: chex.Array   # f32, (n_blocks, 1)


def quantize_blockwise(x: chex.Array, block: int = 2048) -> Quantized8:
    """Quantize ``x`` to blockwise int8 (symmetric absmax-scaled)."""
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scale = absmax / 127.0
    inv = jnp.where(absmax > 0, 127.0 / absmax, 0.0)
    codes = jnp.round(blocks * inv).astype(jnp.int8)
    return Quantized8(codes=codes, scale=scale)


def dequantize_blockwise(q: Quantized8, shape) -> chex.Array:
    """Inverse of :func:`quantize_blockwise` (up to rounding error)."""
    flat = (q.codes.astype(jnp.float32) * q.scale).reshape(-1)
    size = 1
    for s in shape:
        size *= s
    return flat[:size].reshape(shape)


class FactoredAdamState(NamedTuple):
    count: chex.Array
    mu: chex.ArrayTree
    nu_row: chex.ArrayTree  # second moment, mean over the last axis
    nu_col: chex.ArrayTree  # second moment, mean over the second-to-last
    nu_full: chex.ArrayTree  # unfactored nu for params with ndim < 2


def scale_by_adam_factored(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """Adam with an Adafactor-style *factored* second moment.

    For params with >= 2 dims, ``nu`` is stored as its row/column means
    over the last two axes and reconstructed as the rank-1 estimate
    ``R * C / mean(R)`` (Shazeer & Stern 2018, eq. 4); smaller params keep
    a full ``nu``. First moment ``mu`` is kept (optionally in
    ``mu_dtype``, e.g. bf16, or the string ``"int8"`` for blockwise
    int8 codes + f32 block scales — see :class:`Quantized8`). Against
    plain Adam this cuts optimizer-state
    HBM traffic ~60-75% per step — on bandwidth-bound TPU training steps
    the update phase is mostly state traffic (the reference's AdamW,
    ``/root/reference/neuralop/training/adamw.py:62-110``, keeps full f32
    exp_avg/exp_avg_sq).
    """
    mu_int8 = mu_dtype == "int8"

    def is_factored(p):
        return p.ndim >= 2

    def init_fn(params):
        if mu_int8:
            # int8 codes only for matrix-shaped leaves; small leaves
            # (biases, scalars) keep bf16 — quantizing them would pad
            # each to a full block and cost precision where updates are
            # the most individually significant
            mu = jax.tree_util.tree_map(
                lambda p: quantize_blockwise(jnp.zeros_like(p, jnp.float32))
                if is_factored(p)
                else jnp.zeros_like(p, dtype=jnp.bfloat16),
                params,
            )
        else:
            mu = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype),
                params,
            )
        # second-moment statistics are ALWAYS f32, independent of the
        # parameter storage dtype: a bf16 nu freezes once (1-b2)*g^2
        # drops below bf16's ~2^-8 relative precision, and the factored
        # row/col means are tiny so f32 costs nothing
        nu_row = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-1], jnp.float32)
            if is_factored(p) else jnp.zeros((), jnp.float32),
            params,
        )
        nu_col = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            if is_factored(p) else jnp.zeros((), jnp.float32),
            params,
        )
        nu_full = jax.tree_util.tree_map(
            lambda p: jnp.zeros((), jnp.float32)
            if is_factored(p) else jnp.zeros_like(p, dtype=jnp.float32),
            params,
        )
        return FactoredAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=mu, nu_row=nu_row, nu_col=nu_col, nu_full=nu_full,
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)

        if mu_int8:
            # dequantize -> EMA in f32; the *unquantized* fresh moment
            # feeds the update (no double rounding), the quantized one
            # is what's stored
            mu_f32 = jax.tree_util.tree_map(
                lambda m, g: (
                    b1 * (dequantize_blockwise(m, g.shape)
                          if isinstance(m, Quantized8)
                          else m.astype(jnp.float32))
                    + (1 - b1) * g.astype(jnp.float32)
                ),
                state.mu, updates,
                is_leaf=lambda x: isinstance(x, Quantized8),
            )
            mu = jax.tree_util.tree_map(
                lambda m, g: quantize_blockwise(m)
                if is_factored(g) else m.astype(jnp.bfloat16),
                mu_f32, updates,
            )
        else:
            mu = mu_f32 = jax.tree_util.tree_map(
                lambda m, g: (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(
                    m.dtype
                ),
                state.mu, updates,
            )

        def upd_row(r, g):
            if not is_factored(g):
                return r
            g = g.astype(jnp.float32)
            return b2 * r + (1 - b2) * jnp.mean(g * g, axis=-1)

        def upd_col(c, g):
            if not is_factored(g):
                return c
            g = g.astype(jnp.float32)
            return b2 * c + (1 - b2) * jnp.mean(g * g, axis=-2)

        def upd_full(n, g):
            if is_factored(g):
                return n
            g = g.astype(jnp.float32)
            return b2 * n + (1 - b2) * g * g

        nu_row = jax.tree_util.tree_map(upd_row, state.nu_row, updates)
        nu_col = jax.tree_util.tree_map(upd_col, state.nu_col, updates)
        nu_full = jax.tree_util.tree_map(upd_full, state.nu_full, updates)

        def scaled(g, m, r, c, n):
            m_hat = m.astype(jnp.float32) / b1c
            if is_factored(g):
                # rank-1 reconstruction: V ~= (R C^T) / mean(R)
                r_mean = jnp.mean(r, axis=-1, keepdims=True)
                v = (
                    r[..., :, None]
                    * c[..., None, :]
                    / (r_mean[..., None] + 1e-30)
                )
            else:
                v = n
            return m_hat / (jnp.sqrt(v / b2c) + eps)

        new_updates = jax.tree_util.tree_map(
            scaled, updates, mu_f32, nu_row, nu_col, nu_full
        )
        return new_updates, FactoredAdamState(
            count=count, mu=mu, nu_row=nu_row, nu_col=nu_col, nu_full=nu_full
        )

    return optax.GradientTransformation(init_fn, update_fn)


def stochastic_round_to(dtype, x, key):
    """Stochastically round f32 ``x`` to ``dtype`` (bf16): add a uniform
    16-bit integer to the low mantissa bits and truncate, so the result
    rounds up with probability equal to the discarded fraction. Unbiased
    (E[sr(x)] = x), unlike round-to-nearest which silently drops updates
    smaller than half a ulp of the parameter — the standard trick that
    makes low-precision master weights trainable.
    """
    dtype = jnp.dtype(dtype)
    if dtype != jnp.bfloat16:
        raise NotImplementedError("stochastic rounding targets bfloat16")
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    bits = bits + noise
    high = (bits >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(high, jnp.bfloat16)


def apply_updates_sr(params, updates, key):
    """``optax.apply_updates`` with stochastic rounding into low-precision
    parameter leaves: bf16 params accumulate ``p + u`` in f32 and round
    stochastically back to bf16 (per-leaf independent keys); full-precision
    leaves take the plain sum. With bf16 *master* parameters this halves
    the parameter read+write HBM traffic of the optimizer phase vs keeping
    an f32 master copy (the reference trains f32-only; its AdamW is
    ``/root/reference/neuralop/training/adamw.py:62-110``).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    upd_leaves = treedef.flatten_up_to(updates)
    keys = jax.random.split(key, len(leaves))
    out = []
    warned = False
    for p, u, k in zip(leaves, upd_leaves, keys):
        if p.dtype == jnp.bfloat16:
            if u.dtype == jnp.bfloat16 and not warned:
                # an optimizer built with cast_final_updates=True already
                # round-to-nearest'd this update to bf16; SR then rounds
                # a pre-rounded value, partially defeating its
                # unbiasedness. Build the optimizer with
                # cast_final_updates=False when pairing with SR (as
                # build_optimizer and Trainer(stochastic_rounding=True)
                # do).
                import warnings

                warnings.warn(
                    "apply_updates_sr received bf16 updates for bf16 "
                    "params — pass cast_final_updates=False to the "
                    "optimizer so stochastic rounding sees "
                    "full-precision updates",
                    stacklevel=2,
                )
                warned = True
            out.append(
                stochastic_round_to(
                    jnp.bfloat16,
                    p.astype(jnp.float32) + u.astype(jnp.float32),
                    k,
                )
            )
        else:
            out.append((p + u.astype(p.dtype)).astype(p.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def with_final_update_cast(
    tx: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Cast each final update leaf to its parameter's dtype.

    For reduced-precision stored weights (bf16) the cast happens anyway —
    inside ``optax.apply_updates`` — but there XLA materializes it as a
    standalone convert over the full parameter tree (measured 1.2 ms/step
    on the NS-128 bench: 277 MB f32 read + 139 MB bf16 write). Applied at
    the END of the optimizer's update computation instead, the cast is
    the tail of the already-fused elementwise chain, so the materialized
    update tree is bf16 and the standalone convert disappears. The
    weight-decay and learning-rate arithmetic stay f32 (this runs after
    them); only the final stored value is rounded, which the bf16
    parameter add absorbs nearly identically (NOT bit-identically: any
    post-hoc multiply on the bf16 update — e.g. the Trainer's
    lr_scale — rounds twice, and the Trainer therefore performs that
    multiply in f32; see trainer.py). No-op for f32 params.

    Deliberately a *wrapper*, not an extra ``optax.chain`` element: the
    optimizer state pytree is ``tx``'s own, so existing checkpoints
    (``optimizer.msgpack``) restore unchanged.
    """

    def update_fn(updates, state, params=None):
        updates, state = tx.update(updates, state, params)
        if params is not None:
            updates = jax.tree_util.tree_map(
                lambda u, p: u.astype(p.dtype), updates, params
            )
        return updates, state

    return optax.GradientTransformation(tx.init, update_fn)


def adamw(
    learning_rate,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
    mu_dtype=None,
    factored_second_moment: bool = False,
    cast_final_updates: bool = True,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (reference ``training/adamw.py:11``).

    ``factored_second_moment=True`` swaps in the factored-nu Adam kernel
    (see :func:`scale_by_adam_factored`); ``mu_dtype`` stores the first
    moment at reduced precision (``jnp.bfloat16``, or ``"int8"`` for
    blockwise-quantized codes — factored path only). Both cut
    optimizer-state HBM traffic on bandwidth-bound steps.

    ``cast_final_updates`` fuses the final cast-to-param-dtype into the
    update computation (see :func:`with_final_update_cast`). Pass
    ``False`` when applying with stochastic rounding
    (:func:`apply_updates_sr`), which wants full-precision updates at the
    rounding point.
    """
    if mu_dtype == "int8" and not factored_second_moment:
        raise ValueError(
            "mu_dtype='int8' requires factored_second_moment=True "
            "(the blockwise-quantized mu lives in the factored kernel)"
        )
    if factored_second_moment:
        tx = optax.chain(
            scale_by_adam_factored(
                b1=betas[0], b2=betas[1], eps=eps, mu_dtype=mu_dtype
            ),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )
    else:
        tx = optax.adamw(
            learning_rate=learning_rate,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    if cast_final_updates:
        tx = with_final_update_cast(tx)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def build_optimizer(opt_config, steps_per_epoch: int = 1):
    """Build the full optimizer from an ``OptConfig`` section.

    One place for the scripts to honor every optimizer knob the config
    exposes: StepLR folded into the optax schedule, weight decay, the
    ``opt_state`` policy (full / factored / factored8) and EMA. Mirrors
    how the reference's scripts construct AdamW + scheduler from their
    config trees (``/root/reference/config/darcy_config.py:10-43``).
    """
    policy = getattr(opt_config, "opt_state", "full")
    if policy not in ("full", "factored", "factored8"):
        raise ValueError(f"unknown opt.opt_state: {policy!r}")
    tx = adamw(
        step_lr(
            opt_config.learning_rate,
            opt_config.step_size,
            getattr(opt_config, "gamma", 0.5),
            steps_per_epoch,
        ),
        weight_decay=opt_config.weight_decay,
        factored_second_moment=policy != "full",
        mu_dtype={"full": None, "factored": jnp.bfloat16,
                  "factored8": "int8"}[policy],
        # SR applies updates with its own stochastic round and wants the
        # full-precision update at the rounding point
        cast_final_updates=not getattr(
            opt_config, "stochastic_rounding", False
        ),
    )
    if getattr(opt_config, "ema_decay", 0.0) > 0:
        tx = with_ema(tx, decay=opt_config.ema_decay)
    return tx


class EmaState(NamedTuple):
    inner: object
    ema: chex.ArrayTree


def with_ema(
    optimizer: optax.GradientTransformation, decay: float = 0.999
) -> optax.GradientTransformation:
    """Track a Polyak/EMA copy of the *parameters* inside the optimizer
    state: ``ema <- decay * ema + (1-decay) * new_params``.

    No reference counterpart (the reference trains raw params only);
    standard practice for rollout-sensitive operator models. Composes
    with ``Trainer`` (no trainer changes needed — the EMA rides the
    optimizer state, so checkpoints, donation and ZeRO-1 sharding of the
    state all apply to it automatically). Read it back with
    :func:`ema_params`.

    The average folds in the ``params`` *passed to each update* — i.e.
    the parameters as actually applied after the previous step,
    including any post-``update`` scaling the caller performs (the
    Trainer multiplies updates by its epoch scheduler's factor AFTER
    ``optimizer.update``, so folding ``p + u`` here would track a
    trajectory that was never applied). This gives a one-step lag,
    negligible at any practical decay.
    """
    def init_fn(params):
        return EmaState(
            inner=optimizer.init(params),
            ema=jax.tree_util.tree_map(jnp.array, params),
        )

    def update_fn(updates, state, params=None, **extra):
        new_updates, inner = optimizer.update(
            updates, state.inner, params, **extra
        )
        ema = jax.tree_util.tree_map(
            lambda e, p: (decay * e + (1 - decay) * p).astype(e.dtype),
            state.ema, params,
        )
        return new_updates, EmaState(inner=inner, ema=ema)

    tx = optax.GradientTransformation(init_fn, update_fn)
    if getattr(optimizer, "needs_value", False):
        tx.needs_value = True
    return tx


def ema_params(opt_state):
    """Extract the EMA parameter pytree from a :func:`with_ema` state."""
    if not isinstance(opt_state, EmaState):
        raise TypeError(
            "opt_state does not carry an EMA — build the optimizer with "
            "with_ema(...)"
        )
    return opt_state.ema


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
