"""Trainer: epoch loop, jitted train/eval steps, checkpointing, resume.

Equivalent of reference ``neuralop/training/trainer.py``: dict batches
``{'x', 'y', ...}`` flow through ``data_processor.preprocess`` -> model ->
``postprocess`` -> loss; eval computes a ``{loader}_{loss}`` metric dict;
checkpoints save best/interval state on the host.

TPU-native structure: the entire train step (preprocess, forward, loss,
backward, optimizer update) is one jitted, donated function. Data
parallelism is a sharded batch dim on a ('data','model') mesh — no DDP
wrapper; XLA inserts the gradient psum.
"""

import json
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import LpLoss
from ..parallel import mesh as mesh_lib
from .training_state import load_training_state, save_training_state


class Trainer:
    """See reference Trainer (training/trainer.py:27-822) for semantics."""

    def __init__(
        self,
        *,
        model,
        n_epochs: int,
        wandb_log: bool = False,
        device=None,
        mesh=None,
        mixed_precision: bool = False,
        data_processor=None,
        eval_interval: int = 1,
        log_output: bool = False,
        use_distributed: bool = False,
        zero_sharding: bool = False,
        stochastic_rounding: bool = False,
        verbose: bool = False,
    ):
        self.model = model
        self.n_epochs = n_epochs
        self.wandb_log = wandb_log
        self.mesh = mesh or (mesh_lib.get_mesh() if use_distributed else None)
        self.mixed_precision = mixed_precision
        self.data_processor = data_processor
        self.eval_interval = eval_interval
        self.log_output = log_output
        self.verbose = verbose

        # ZeRO-1: shard optimizer state over the 'data' axis (1/N HBM per
        # device); XLA derives the reduce-scatter/all-gather schedule from
        # the sharding annotations (parallel/zero.py)
        self.zero_sharding = zero_sharding
        self._zero_specs = None

        # stochastic rounding: bf16 parameter leaves accumulate updates in
        # f32 and round stochastically (unbiased) back to bf16 — enables
        # bf16 *master* params, halving parameter HBM traffic in the update
        # phase (training/optimizer.py::apply_updates_sr)
        self.stochastic_rounding = stochastic_rounding
        self._sr_base_key = jax.random.PRNGKey(0x5757)

        self.params = None
        self.opt_state = None
        self.start_epoch = 0
        self._train_step = None
        self._eval_steps: Dict[str, Callable] = {}
        self._autoreg_cache: Dict = {}

        if wandb_log:
            try:
                import wandb  # noqa: F401

                self._wandb = wandb
            except ImportError:
                self._wandb = None
                self.wandb_log = False
        else:
            self._wandb = None

    # ------------------------------------------------------------------ #
    def _init_params(self, batch: dict):
        """Initialize params from a (preprocessed) sample batch.

        The model sees exactly what the train step will feed it: the sample
        after ``data_processor.preprocess`` with every non-'y' key passed as
        a keyword argument.
        """
        sample = dict(batch)
        if self.data_processor is not None:
            sample = self.data_processor.preprocess(sample, train=True)
        kwargs = {
            k: jnp.asarray(v)
            for k, v in sample.items()
            if k != "y" and not k.startswith("_loss_")
        }
        rng = jax.random.PRNGKey(0)
        # jit the init: single fused program, and complex intermediates never
        # surface as eager device arrays (restricted TPU runtimes cannot
        # transfer complex arrays host-side)
        variables = jax.jit(lambda r: self.model.init(r, **kwargs))(rng)
        return variables["params"]

    def _model_kwargs_from_sample(self, sample: dict) -> dict:
        """Extra kwargs forwarded to the model (beyond 'x').

        Keys with the reserved "_loss_" prefix are loss auxiliaries
        (e.g. the precomputed H1 denominator), never model kwargs —
        the same carve-out the train step applies.
        """
        return {
            k: v
            for k, v in sample.items()
            if k not in ("x", "y") and not k.startswith("_loss_")
        }

    def _half_policy(self, params, kwargs):
        """bf16 mixed precision: cast params + float inputs to bf16 for
        the forward/backward; master params stay f32 (the cast is
        differentiable, so grads land on the f32 tree). bf16's exponent
        range matches f32, so no loss scaling is needed — the TPU-native
        counterpart of the reference's torch.autocast
        (trainer.py:518-536).
        """
        import jax.numpy as _jnp

        def to_half(a):
            if hasattr(a, "dtype") and a.dtype == _jnp.float32:
                return a.astype(_jnp.bfloat16)
            return a

        return (
            jax.tree_util.tree_map(to_half, params),
            {k: to_half(jnp.asarray(v)) for k, v in kwargs.items()},
        )

    def _build_train_step(
        self,
        optimizer,
        training_loss,
        regularizer=None,
        rollout_steps: int = 1,
        pushforward: bool = True,
    ):
        data_processor = self.data_processor
        model = self.model
        mixed = self.mixed_precision

        def loss_fn(params, batch):
            sample = dict(batch)
            if data_processor is not None:
                sample = data_processor.preprocess(sample, train=True)
            # dict batches carry all model arguments (reference
            # trainer.py:487-541 calls self.model(**sample)); keys with the
            # reserved "_loss_" prefix are loss auxiliaries, not model args
            kwargs = {
                k: v
                for k, v in sample.items()
                if k != "y" and not k.startswith("_loss_")
            }
            if mixed:
                apply_params, kwargs = self._half_policy(params, kwargs)
            else:
                apply_params = params
            if rollout_steps > 1:
                # Multi-step (pushforward-style) rollout training: 'y' is a
                # trajectory (b, K, c, spatial...); the model is unrolled K
                # steps feeding its own (normalized) predictions back. With
                # ``pushforward=True`` a stop_gradient sits between steps —
                # each step trains on model-rollout inputs at single-step
                # backward cost (the pushforward trick); with False the
                # chain is differentiated end-to-end (full BPTT). The
                # reference has rollout *eval* only (trainer.py:589-671).
                x = kwargs.pop("x")
                y_traj = sample["y"]
                feedback = getattr(data_processor, "feedback", None)
                step_losses = []
                for j in range(rollout_steps):
                    out = model.apply({"params": apply_params}, x, **kwargs)
                    step_losses.append(
                        training_loss(out.astype(jnp.float32), y_traj[:, j])
                    )
                    if j < rollout_steps - 1:
                        nxt = out if feedback is None else feedback(out)
                        x = (
                            jax.lax.stop_gradient(nxt) if pushforward else nxt
                        )
                loss = sum(step_losses) / rollout_steps
                if regularizer is not None:
                    reg = (
                        regularizer.loss(params)
                        if hasattr(regularizer, "loss")
                        else regularizer(params)
                    )
                    loss = loss + reg
                return loss
            out = model.apply({"params": apply_params}, **kwargs)
            out = out.astype(jnp.float32)
            if data_processor is not None:
                out, sample = data_processor.postprocess(out, sample, train=True)
            if "_loss_ynorm_sq" in sample:
                loss = training_loss(
                    out, sample["y"], ynorm_sq=sample["_loss_ynorm_sq"]
                )
            else:
                loss = training_loss(out, sample["y"])
            if regularizer is not None:
                # reference accumulates the penalty during forward and adds
                # it to the batch loss (trainer.py:505-506, :538-539);
                # functionally that is a params-dependent penalty term
                reg = (
                    regularizer.loss(params)
                    if hasattr(regularizer, "loss")
                    else regularizer(params)
                )
                loss = loss + reg
            return loss

        needs_value = getattr(optimizer, "needs_value", False)
        zero_specs, zero_mesh = self._zero_specs, self.mesh

        use_sr = self.stochastic_rounding

        def step(params, opt_state, batch, lr_scale, sr_key=None):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            if needs_value:
                updates, opt_state = optimizer.update(
                    grads, opt_state, params, value=loss
                )
            else:
                updates, opt_state = optimizer.update(grads, opt_state, params)
            if zero_specs is not None:
                from ..parallel import zero as zero_lib

                opt_state = zero_lib.constrain(
                    opt_state, zero_specs, zero_mesh
                )
            # epoch-scheduler protocol: the Trainer scales updates by the
            # scheduler's current factor (equivalent to scaling the LR,
            # including AdamW's decoupled weight decay — both are
            # lr-multiplied in torch and in optax.adamw). The multiply
            # runs in f32 even for bf16 update leaves so non-power-of-two
            # scheduler factors are not quantized to bf16 (~2^-9 rel);
            # XLA fuses the convert-multiply-convert into the elementwise
            # chain, so the materialized update tree stays bf16.
            updates = jax.tree_util.tree_map(
                lambda u: (u.astype(jnp.float32) * lr_scale).astype(u.dtype),
                updates,
            )
            if use_sr:
                from .optimizer import apply_updates_sr

                params = apply_updates_sr(params, updates, sr_key)
            else:
                params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._raw_train_step = step  # reused by the epoch-scan path
        return jax.jit(step, donate_argnums=(0, 1))

    def _build_epoch_fn(self, batch_size: int):
        """One jitted program per EPOCH: the dataset lives on the device and
        a ``lax.scan`` iterates shuffled batches (gathered by index) through
        the train step. On relay-attached TPUs the per-dispatch overhead
        (~25 ms here) otherwise dominates small steps; this amortizes it
        across the whole epoch — the TPU-native replacement for the
        reference's host-side DataLoader loop (trainer.py:266-334).
        """
        step = self._raw_train_step
        use_sr = self.stochastic_rounding

        def epoch_fn(params, opt_state, data, perm, lr_scale, epoch_key):
            nb = perm.shape[0] // batch_size
            idx = perm[: nb * batch_size].reshape(nb, batch_size)

            def body(carry, scanned):
                params, opt_state, s = carry
                b_idx, i = scanned
                batch = {
                    k: jnp.take(v, b_idx, axis=0) for k, v in data.items()
                }
                sr_key = (
                    jax.random.fold_in(epoch_key, i) if use_sr else None
                )
                params, opt_state, loss = step(
                    params, opt_state, batch, lr_scale, sr_key
                )
                return (params, opt_state, s + loss), None

            (params, opt_state, s), _ = jax.lax.scan(
                body,
                (params, opt_state, jnp.float32(0.0)),
                (idx, jnp.arange(nb)),
            )
            return params, opt_state, s / nb

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    def _build_eval_step(self, eval_losses):
        data_processor = self.data_processor
        model = self.model

        mixed = self.mixed_precision

        def step(params, batch):
            sample = dict(batch)
            if data_processor is not None:
                sample = data_processor.preprocess(sample, train=False)
            kwargs = {k: v for k, v in sample.items() if k != "y"}
            if mixed:
                params, kwargs = self._half_policy(params, kwargs)
            out = model.apply({"params": params}, **kwargs)
            out = out.astype(jnp.float32)
            if data_processor is not None:
                out, sample = data_processor.postprocess(out, sample, train=False)
            return {
                name: loss(out, sample["y"]) for name, loss in eval_losses.items()
            }

        return jax.jit(step)

    def _put(self, batch: dict) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        return batch

    # ------------------------------------------------------------------ #
    def train(
        self,
        train_loader,
        test_loaders: Dict,
        optimizer,
        scheduler=None,
        regularizer=None,
        training_loss=None,
        eval_losses=None,
        save_every: Optional[int] = None,
        save_best: Optional[str] = None,
        save_dir="./ckpt",
        resume_from_dir=None,
        warm_start_from=None,
        warm_start_name: str = "best_model",
        warm_start_opt: bool = False,
        rollout_steps: int = 1,
        pushforward: bool = True,
        device_dataset: bool = False,
        epoch_scan_chunk: Optional[int] = None,
        shuffle_seed: int = 0,
    ) -> Dict[str, float]:
        """Train the model.

        ``scheduler`` follows the reference's per-epoch protocol
        (trainer.py:296-310): after every epoch the Trainer calls
        ``scheduler.step()`` — or ``scheduler.step(train_err)`` when the
        scheduler declares ``needs_metric`` (the ReduceLROnPlateau branch) —
        and multiplies optimizer updates by ``scheduler.factor``. Use
        :class:`training.optimizer.StepLR` / ``ReduceLROnPlateau``, or pass
        ``None`` when the schedule is already folded into the optimizer.

        ``regularizer`` is a params-dependent penalty added to every batch
        loss: a callable ``regularizer(params) -> scalar`` or an object with
        ``.loss(params)`` (the reference adds ``regularizer.loss``
        accumulated during forward, trainer.py:538-539).

        ``rollout_steps > 1`` enables multi-step rollout training: each
        batch's ``y`` must be a trajectory ``(b, K, c, spatial...)`` with
        ``K >= rollout_steps``; the model is unrolled feeding its own
        predictions back, with a stop_gradient between steps when
        ``pushforward=True`` (single-step backward cost, rollout-state
        input distribution) or full BPTT when ``False``.

        ``device_dataset=True`` stages the full training set in device
        memory once and runs each epoch as a single jitted ``lax.scan``
        program over shuffled batches — per-step dispatch overhead
        (dominant on relay-attached TPUs) is amortized across the epoch.
        Requires array-only dict batches and a jit-traceable
        data_processor; single-device path (use the loader loop on a
        mesh).

        ``epoch_scan_chunk`` caps the number of scan steps compiled into
        one epoch program: epochs longer than the cap are split into
        equal-length chunks executed back-to-back (one compiled program,
        reused). The relayed TPU worker has been observed to crash on
        very long single-program executions (a 5000-step epoch scan dies
        where 2500-step ones are stable), so hour-scale recipes with
        large ``n_train`` should set this to the largest step count a
        previous run survived. Up to ``k_chunks - 1`` trailing batches
        per epoch are dropped to keep chunk shapes equal (drop-last
        semantics).
        """
        if training_loss is None:
            training_loss = LpLoss(d=2)
        if eval_losses is None:
            eval_losses = {"l2": LpLoss(d=2)}

        first_batch = next(iter(train_loader))
        if rollout_steps > 1:
            y0 = np.asarray(first_batch["y"])
            if y0.ndim < 3 or y0.shape[1] < rollout_steps:
                raise ValueError(
                    f"rollout_steps={rollout_steps} needs trajectory targets "
                    f"(b, K>={rollout_steps}, c, spatial...); got {y0.shape}"
                )
        if self.params is None:
            self.params = self._init_params(first_batch)
            if self.stochastic_rounding:
                # SR means bf16 MASTER params: cast every f32 leaf so the
                # update phase carries no f32 parameter copy at all
                # (matches bench.py --sr; unbiased rounding keeps training
                # stable — tests/test_stochastic_rounding.py)
                self.params = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32
                    else a,
                    self.params,
                )
        # Optimizer STATE is always initialized from an f32-promoted
        # tree: optax derives state dtypes from param dtypes, and a bf16
        # second moment freezes once (1-b2)*g^2 drops below bf16's ~2^-8
        # relative precision. Low-precision *storage* (weight_dtype,
        # SR masters) compresses the parameter copy, never the Adam
        # statistics (which are tiny when factored, and load-bearing).
        self.opt_state = optimizer.init(
            jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                self.params,
            )
        )

        if warm_start_from is not None and resume_from_dir is None:
            # params-only warm start (fine-tuning): load weights from a
            # prior run's checkpoint but keep the fresh optimizer state,
            # scheduler position and epoch counter — unlike resume, which
            # restores all three. ``warm_start_opt=True`` additionally
            # loads the donor's optimizer.msgpack (its latest periodic
            # save): when the fine-tune data comes from the same
            # distribution the donor's Adam second-moment statistics are
            # still valid, and starting from them avoids the
            # warm-restart bump — a fresh optimizer state knocks a
            # converged model well off its optimum for many epochs
            # (measured: a 2e-4 NS flagship regressed to 2.65e-4 for 40+
            # epochs under a fresh state at lr 2e-5). Requires the same
            # optimizer configuration as the donor run; on a structure
            # mismatch it warns and keeps the fresh state.
            self.params, _, ws_epoch = load_training_state(
                warm_start_from, warm_start_name, self.params
            )
            ws_opt_state = None
            if warm_start_opt:
                import warnings

                try:
                    _, ws_opt_state, _ = load_training_state(
                        warm_start_from,
                        warm_start_name,
                        self.params,
                        self.opt_state,
                    )
                    if ws_opt_state is None:
                        warnings.warn(
                            f"warm_start_opt=True but no "
                            f"optimizer.msgpack under {warm_start_from}; "
                            "continuing with a fresh optimizer state"
                        )
                except Exception as e:  # donor used a different optimizer
                    warnings.warn(
                        f"warm_start_opt=True but the donor optimizer "
                        f"state under {warm_start_from} does not match "
                        f"this run's optimizer ({e}); continuing with a "
                        "fresh state"
                    )
                if ws_opt_state is not None:
                    self.opt_state = ws_opt_state
            if self.verbose:
                print(
                    f"warm-starting params from {warm_start_from}/"
                    f"{warm_start_name} (source epoch {ws_epoch}, "
                    f"optimizer state "
                    f"{'loaded' if warm_start_opt and ws_opt_state is not None else 'fresh'})"
                )

        if resume_from_dir is not None and Path(resume_from_dir).exists():
            self.params, opt_state, epoch = load_training_state(
                resume_from_dir, "model", self.params, self.opt_state
            )
            if opt_state is not None:
                self.opt_state = opt_state
            if epoch is not None:
                self.start_epoch = epoch + 1
            if self.verbose:
                print(f"resuming from {resume_from_dir} at epoch {self.start_epoch}")

        if self.mesh is not None:
            self.params = mesh_lib.shard_params(self.params, self.mesh)
            if self.zero_sharding:
                from ..parallel import zero as zero_lib

                self._zero_specs = zero_lib.zero_specs(
                    self.opt_state, self.mesh
                )
                self.opt_state = zero_lib.shard_opt_state(
                    self.opt_state, self.mesh
                )
            else:
                self.opt_state = jax.device_put(
                    self.opt_state,
                    jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()
                    ),
                )

        train_step = self._build_train_step(
            optimizer,
            training_loss,
            regularizer,
            rollout_steps=rollout_steps,
            pushforward=pushforward,
        )
        eval_step = self._build_eval_step(eval_losses)

        epoch_fn = None
        device_data = None
        batch_size = None
        shuffle_rng = np.random.default_rng(shuffle_seed)
        if device_dataset:
            if self.mesh is not None:
                raise ValueError(
                    "device_dataset is a single-device path; use the "
                    "loader loop with a mesh"
                )
            batch_size = len(first_batch["x"])
            stacked: Dict[str, list] = {}
            for batch in train_loader:
                for k, v in batch.items():
                    stacked.setdefault(k, []).append(np.asarray(v))
            device_data = {
                k: jax.device_put(np.concatenate(v))
                for k, v in stacked.items()
            }
            self._n_device_samples = len(next(iter(device_data.values())))
            # losses whose rel-denominator depends only on the target
            # (H1Loss.ynorm_sq) get it precomputed ONCE over the staged
            # dataset: each train step then runs one FD stencil pass on
            # the difference instead of two on (pred, target)
            from ..data.transforms import DefaultDataProcessor

            if (
                rollout_steps == 1
                and hasattr(training_loss, "ynorm_sq")
                and (
                    self.data_processor is None
                    or isinstance(self.data_processor, DefaultDataProcessor)
                )
            ):
                dp, tl = self.data_processor, training_loss

                @jax.jit
                def _ynorms(data):
                    sample = dict(data)
                    if dp is not None:
                        sample = dp.preprocess(sample, train=True)
                    return tl.ynorm_sq(sample["y"])

                device_data["_loss_ynorm_sq"] = _ynorms(device_data)
            epoch_fn = self._build_epoch_fn(batch_size)

        best_metric = float("inf")
        best_params = None
        # a resumed run must not let its first (typically worse) eval
        # overwrite the stored best_model: restore the best metric the
        # interrupted run recorded for the same save_best key
        if resume_from_dir is not None and save_best is not None:
            manifest_path = Path(resume_from_dir) / "manifest.json"
            if manifest_path.exists():
                try:
                    manifest = json.loads(manifest_path.read_text())
                except (json.JSONDecodeError, OSError):
                    manifest = {}
                if manifest.get("best_key") == save_best:
                    best_metric = float(
                        manifest.get("best_metric", float("inf"))
                    )
        elif (
            resume_from_dir is None
            and save_dir is not None
            and (save_every is not None or save_best is not None)
        ):
            # fresh (non-resume) run into a reused save_dir: a stale
            # manifest from a previous experiment must not leak its
            # best_metric/epoch into this run's saves (the merge in
            # save_training_state would otherwise carry them forward,
            # and a later resume_from_dir=save_dir could suppress
            # best_model saves behind an unbeatable stale metric)
            stale = Path(save_dir) / "manifest.json"
            if stale.exists():
                stale.unlink()
        all_metrics: Dict[str, float] = {}

        if save_every is not None or save_best is not None:
            # architecture sidecars so weight-only training states can be
            # rebuilt without the training script (scripts/serve_model.py)
            from ..models.base_model import save_arch_metadata

            try:
                save_arch_metadata(self.model, save_dir, "model")
                if save_best is not None:
                    save_arch_metadata(self.model, save_dir, "best_model")
            except Exception:
                pass  # unregistered/custom modules: weights still saved
            # persist fitted normalizer statistics once (they do not
            # change during training): makes the checkpoint evaluable
            # without refitting the exact train pipeline
            if self.data_processor is not None and hasattr(
                self.data_processor, "state_dict"
            ):
                try:
                    Path(save_dir).mkdir(parents=True, exist_ok=True)
                    (Path(save_dir) / "data_processor.json").write_text(
                        json.dumps(self.data_processor.state_dict())
                    )
                except (TypeError, ValueError):
                    pass

        for epoch in range(self.start_epoch, self.n_epochs):
            t0 = time.perf_counter()
            if self.data_processor is not None and hasattr(
                self.data_processor, "step"
            ):
                self.data_processor.step(epoch)
            lr_scale = jnp.asarray(
                getattr(scheduler, "factor", 1.0), jnp.float32
            )
            if epoch_fn is not None:
                perm = jnp.asarray(
                    shuffle_rng.permutation(self._n_device_samples),
                    jnp.int32,
                )
                epoch_key = jax.random.fold_in(self._sr_base_key, epoch)
                nb_total = self._n_device_samples // batch_size
                k_chunks = 1
                if epoch_scan_chunk is not None and (
                    nb_total > epoch_scan_chunk
                ):
                    k_chunks = -(-nb_total // epoch_scan_chunk)
                if k_chunks == 1:
                    self.params, self.opt_state, mean_loss = epoch_fn(
                        self.params, self.opt_state, device_data, perm,
                        lr_scale, epoch_key,
                    )
                    train_err = float(mean_loss)
                else:
                    # equal-shape chunks reuse one compiled program;
                    # up to k_chunks-1 trailing batches drop (drop-last)
                    span = (nb_total // k_chunks) * batch_size
                    loss_sum = 0.0
                    for c in range(k_chunks):
                        (
                            self.params, self.opt_state, mean_loss,
                        ) = epoch_fn(
                            self.params, self.opt_state, device_data,
                            perm[c * span: (c + 1) * span], lr_scale,
                            jax.random.fold_in(epoch_key, c),
                        )
                        loss_sum += float(mean_loss)
                    train_err = loss_sum / k_chunks
            else:
                train_err = 0.0
                n_batches = 0
                for batch in train_loader:
                    batch = self._put(batch)
                    sr_key = jax.random.fold_in(
                        self._sr_base_key, epoch * 100003 + n_batches
                    )
                    self.params, self.opt_state, loss = train_step(
                        self.params, self.opt_state, batch, lr_scale, sr_key
                    )
                    train_err += float(loss)
                    n_batches += 1
                train_err /= max(n_batches, 1)
            if scheduler is not None:
                if getattr(scheduler, "needs_metric", False):
                    scheduler.step(train_err)
                else:
                    scheduler.step()
            epoch_time = time.perf_counter() - t0
            all_metrics["train_err"] = train_err
            all_metrics["epoch_time"] = epoch_time

            if epoch % self.eval_interval == 0 or epoch == self.n_epochs - 1:
                eval_metrics = self.evaluate_all(eval_step, test_loaders)
                all_metrics.update(eval_metrics)
                if self.wandb_log and self._wandb is not None:
                    payload = {**eval_metrics, "train_err": train_err}
                    if self.log_output:
                        img = self._render_eval_output(test_loaders)
                        if img is not None:
                            payload["eval_output"] = img
                    self._wandb.log(payload, step=epoch)
                if self.verbose:
                    msg = ", ".join(
                        f"{k}={v:.5f}" for k, v in eval_metrics.items()
                    )
                    print(
                        f"[{epoch}] time={epoch_time:.2f}s "
                        f"train={train_err:.5f} {msg}"
                    )
                if save_best is not None:
                    metric = eval_metrics.get(save_best)
                    if metric is not None and metric < best_metric:
                        best_metric = metric
                        best_params = jax.device_get(self.params)
                        # epoch=None: the best save must not advance the
                        # manifest's resume epoch past the periodic
                        # "model" checkpoint it rides with
                        save_training_state(
                            save_dir,
                            "best_model",
                            best_params,
                            epoch=None,
                            extra_manifest={
                                "best_metric": float(metric),
                                "best_epoch": epoch,
                                "best_key": save_best,
                            },
                        )
            if save_every is not None and epoch % save_every == 0:
                save_training_state(
                    save_dir, "model", self.params, self.opt_state, epoch=epoch
                )

        if save_every is not None or save_best is not None:
            save_training_state(
                save_dir,
                "model",
                self.params,
                self.opt_state,
                epoch=self.n_epochs - 1,
            )
        return all_metrics

    def _render_eval_output(self, test_loaders: Dict):
        """First eval prediction as a wandb.Image (reference
        trainer.py:465-466 logs model outputs when log_output=True)."""
        if self._wandb is None or not test_loaders:
            return None
        try:
            loader = next(iter(test_loaders.values()))
            batch = self._put(dict(next(iter(loader))))
            sample = dict(batch)
            if self.data_processor is not None:
                sample = self.data_processor.preprocess(sample, train=False)
            kwargs = {k: v for k, v in sample.items() if k != "y"}
            out = self.model.apply({"params": self.params}, **kwargs)
            if self.data_processor is not None:
                out, _ = self.data_processor.postprocess(
                    out, sample, train=False
                )
            arr = np.asarray(out)[0]
            while arr.ndim > 2:  # first channel / first slice of >2-D fields
                arr = arr[0]
            lo, hi = float(arr.min()), float(arr.max())
            arr = (arr - lo) / (hi - lo + 1e-12)
            return self._wandb.Image(arr)
        except Exception:
            return None  # logging must never break training

    # ------------------------------------------------------------------ #
    def evaluate_all(self, eval_step, test_loaders: Dict) -> Dict[str, float]:
        metrics = {}
        for loader_name, loader in test_loaders.items():
            metrics.update(self.evaluate(eval_step, loader, prefix=str(loader_name)))
        return metrics

    def evaluate(
        self,
        eval_step,
        loader,
        prefix: str,
        mode: str = "single_step",
        eval_losses=None,
        max_steps: Optional[int] = None,
    ) -> Dict[str, float]:
        """Evaluation: mean of per-batch sums / n_samples.

        Matches reference ``Trainer.evaluate`` (trainer.py:385-468) with
        'sum'-reduction losses. ``mode='autoregression'`` rolls the model
        out over a trajectory target ``y`` of shape (b, T, c, spatial...),
        feeding predictions back as inputs (trainer.py:589-671).
        """
        totals: Dict[str, float] = {}
        n_samples = 0
        for batch in loader:
            if (
                mode == "autoregression"
                and self.data_processor is not None
                and hasattr(self.data_processor, "format_rollout_batch")
                and "output_fields" in batch
            ):
                # the_well-layout trajectory batch: build the scan's
                # initial carry + raw targets (the reference instead
                # mutates data_dict across a host loop, trainer.py:589-671)
                batch = self.data_processor.format_rollout_batch(
                    self._put(dict(batch))
                )
            bsz = len(batch["x"]) if "x" in batch else len(
                next(iter(batch.values()))
            )
            if mode == "single_step":
                vals = eval_step(self.params, self._put(batch))
            elif mode == "autoregression":
                vals = self._eval_autoregressive(
                    self._put(batch), eval_losses, max_steps
                )
            else:
                raise ValueError(f"unknown eval mode {mode!r}")
            for k, v in vals.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n_samples += bsz
        return {
            f"{prefix}_{k}": v / max(n_samples, 1) for k, v in totals.items()
        }

    def _eval_autoregressive(self, batch, eval_losses, max_steps):
        """Rollout eval: y is a trajectory (b, T, c, spatial...).

        The whole rollout runs as ONE jitted ``lax.scan`` program (the
        reference host-loops one forward per step, trainer.py:589-671;
        on a remote TPU runtime that serializes on per-step host syncs).
        """
        if max_steps is None:
            # a the_well-style processor can carry the rollout horizon
            max_steps = getattr(self.data_processor, "n_steps_rollout", None)
        y = batch["y"]
        T = y.shape[1] if max_steps is None else min(max_steps, y.shape[1])
        names = tuple(sorted(eval_losses))
        key = (T, names, tuple(y.shape))
        if key not in self._autoreg_cache:
            model = self.model
            data_processor = self.data_processor
            losses = {k: eval_losses[k] for k in names}

            def rollout(params, x, y):
                def body(x, yt):
                    sample = {"x": x}
                    if data_processor is not None:
                        sample = data_processor.preprocess(sample, train=False)
                    out = model.apply({"params": params}, sample["x"])
                    if data_processor is not None:
                        out, _ = data_processor.postprocess(
                            out, sample, train=False
                        )
                    vals = jnp.stack(
                        [
                            jnp.asarray(losses[k](out, yt), jnp.float32)
                            for k in names
                        ]
                    )
                    if data_processor is not None and hasattr(
                        data_processor, "ar_feedback"
                    ):
                        # pure-function window feedback (the_well-style
                        # processors: shift input steps, append the
                        # normalized prediction, keep constant channels)
                        return data_processor.ar_feedback(x, out), vals
                    return out, vals

                _, vals = jax.lax.scan(
                    body, x, jnp.moveaxis(y[:, :T], 0, 1)
                )
                return jnp.sum(vals, axis=0)  # (n_losses,)

            self._autoreg_cache[key] = jax.jit(rollout)

        vals = self._autoreg_cache[key](self.params, batch["x"], y)
        self._last_rollout_T = T  # introspection for tests/metrics
        vals = np.asarray(vals)
        return {k: float(vals[i]) / max(T, 1) for i, k in enumerate(names)}
