"""Incremental FNO trainer (iFNO): grow Fourier modes during training.

Equivalent of reference ``neuralop/training/incremental.py``: loss-gap and
gradient-explained-variance criteria decide when to raise ``n_modes``. In
JAX, n_modes is a static argument of the jitted step — changing it triggers
one retrace (a handful of times per run), while the weights (sized by
``max_n_modes``) are untouched; the active modes index the weight center.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import compute_explained_variance
from .trainer import Trainer


class IncrementalFNOTrainer(Trainer):
    """See reference IncrementalFNOTrainer (training/incremental.py:9-259)."""

    def __init__(
        self,
        *,
        model,
        n_epochs: int,
        incremental_grad: bool = False,
        incremental_loss_gap: bool = False,
        incremental_grad_eps: float = 0.001,
        incremental_buffer: int = 5,
        incremental_max_iter: int = 1,
        incremental_grad_max_iter: int = 10,
        incremental_loss_eps: float = 0.001,
        starting_n_modes=None,
        **kwargs,
    ):
        super().__init__(model=model, n_epochs=n_epochs, **kwargs)
        assert incremental_grad or incremental_loss_gap, (
            "IncrementalFNOTrainer expects one incremental algorithm enabled"
        )
        assert not (incremental_grad and incremental_loss_gap), (
            "only one incremental algorithm may be enabled"
        )
        self.incremental_loss_gap = incremental_loss_gap
        self.incremental_grad = incremental_grad
        self.incremental_grad_eps = incremental_grad_eps
        self.incremental_buffer = incremental_buffer
        self.incremental_max_iter = incremental_max_iter
        self.incremental_grad_max_iter = incremental_grad_max_iter
        self.incremental_loss_eps = incremental_loss_eps
        self.loss_list = []

        max_modes = model.max_n_modes or model.n_modes
        self.max_modes = tuple(max_modes)
        self.current_n_modes = tuple(
            starting_n_modes if starting_n_modes is not None else model.n_modes
        )
        self.accumulated_grad = None
        self.grad_iter = 1
        self._step_cache: Dict = {}

    # -- override step builders to close over the current (static) n_modes --
    def _build_train_step(self, optimizer, training_loss, regularizer=None):
        n_modes = self.current_n_modes
        # the jitted step closes over optimizer/loss/regularizer — key the
        # cache on their identities so a second train() call with different
        # objects does not silently reuse a stale step
        key = (
            "train", n_modes, id(optimizer), id(training_loss),
            id(regularizer),
        )
        if key in self._step_cache:
            return self._step_cache[key]
        data_processor = self.data_processor
        model = self.model

        mixed = self.mixed_precision

        def loss_fn(params, batch):
            sample = dict(batch)
            if data_processor is not None:
                sample = data_processor.preprocess(sample, train=True)
            x = sample["x"]
            if mixed:
                params, half = self._half_policy(params, {"x": x})
                x = half["x"]
            out = model.apply({"params": params}, x, n_modes=n_modes)
            out = out.astype(jnp.float32)
            if data_processor is not None:
                out, sample = data_processor.postprocess(out, sample, train=True)
            loss = training_loss(out, sample["y"])
            if regularizer is not None:
                reg = (
                    regularizer.loss(params)
                    if hasattr(regularizer, "loss")
                    else regularizer(params)
                )
                loss = loss + reg
            return loss

        def step(params, opt_state, batch, lr_scale):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(
                lambda u: u * lr_scale.astype(u.dtype), updates
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, grads

        fn = jax.jit(step, donate_argnums=(0, 1))
        self._step_cache[key] = fn
        return fn

    def train(self, train_loader, test_loaders, optimizer, scheduler=None,
              regularizer=None, training_loss=None, eval_losses=None, **kwargs):
        """Epoch loop with per-epoch incremental mode updates."""
        from ..losses import LpLoss

        if training_loss is None:
            training_loss = LpLoss(d=2)
        if eval_losses is None:
            eval_losses = {"l2": LpLoss(d=2)}

        first_batch = next(iter(train_loader))
        if self.params is None:
            self.params = self._init_params(first_batch)
        self.opt_state = optimizer.init(self.params)
        eval_step = self._build_eval_step(eval_losses)

        all_metrics = {}
        for epoch in range(self.n_epochs):
            train_step = self._build_train_step(
                optimizer, training_loss, regularizer
            )
            total, n = 0.0, 0
            grads = None
            lr_scale = jnp.asarray(
                getattr(scheduler, "factor", 1.0), jnp.float32
            )
            for batch in train_loader:
                batch = self._put(batch)
                self.params, self.opt_state, loss, grads = train_step(
                    self.params, self.opt_state, batch, lr_scale
                )
                total += float(loss)
                n += 1
            avg_loss = total / max(n, 1)
            if scheduler is not None:
                if getattr(scheduler, "needs_metric", False):
                    scheduler.step(avg_loss)
                else:
                    scheduler.step()
            all_metrics["train_err"] = avg_loss
            self.incremental_update(avg_loss, grads)
            if epoch % self.eval_interval == 0 or epoch == self.n_epochs - 1:
                metrics = self.evaluate_all(eval_step, test_loaders)
                all_metrics.update(metrics)
                if self.verbose:
                    print(
                        f"[{epoch}] modes={self.current_n_modes} "
                        f"train={avg_loss:.5f} "
                        + ", ".join(f"{k}={v:.5f}" for k, v in metrics.items())
                    )
        return all_metrics

    # ------------------------------------------------------------------ #
    def incremental_update(self, loss: Optional[float], grads=None):
        if self.incremental_loss_gap and loss is not None:
            self.loss_gap(loss)
        if self.incremental_grad and grads is not None:
            self.grad_explained(grads)

    def loss_gap(self, loss: float):
        """Raise modes by one when loss improvement stalls
        (reference incremental.py:163-197)."""
        self.loss_list.append(loss)
        modes = self.current_n_modes[0]
        if len(self.loss_list) > 1:
            if (
                abs(self.loss_list[-1] - self.loss_list[-2])
                <= self.incremental_loss_eps
            ):
                if modes < self.max_modes[0]:
                    modes += 1
        self.current_n_modes = tuple([modes] * len(self.current_n_modes))

    def _first_conv_grad(self, grads):
        """Gradient (real storage) of the first spectral conv's weight."""
        node = grads
        for k in ("fno_blocks", "conv_0"):
            node = node[k]
        name = "w_weight" if "w_weight" in node else sorted(node)[0]
        stor = node[name]
        return stor[0] + 1j * stor[1]

    def grad_explained(self, grads):
        """Raise modes when mode-gradient spectrum isn't explained by the
        current modes (reference incremental.py:199-259)."""
        g = np.asarray(jax.device_get(self._first_conv_grad(grads)))
        if self.accumulated_grad is None:
            self.accumulated_grad = np.zeros_like(g)
        ndim = len(self.current_n_modes)
        if self.grad_iter <= self.incremental_grad_max_iter:
            self.grad_iter += 1
            self.accumulated_grad = self.accumulated_grad + g
            return
        modes = self.current_n_modes[0]
        weight = self.accumulated_grad
        strength = [
            float(np.linalg.norm(weight[:, m]))
            for m in range(min(weight.shape[1], modes))
        ]
        ratio = compute_explained_variance(
            modes - self.incremental_buffer, jnp.asarray(strength)
        )
        if ratio < self.incremental_grad_eps and modes < self.max_modes[0]:
            modes += 1
        self.grad_iter = 1
        self.accumulated_grad = np.zeros_like(weight)
        self.current_n_modes = tuple([modes] * ndim)
