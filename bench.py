"""Benchmark: Navier-Stokes-128² FNO training on one chip.

Prints ONE JSON line with BOTH BASELINE.json metrics:

  {"metric": "ns128_fno_train_steps_per_sec", "value": N,
   "unit": "steps/sec", "vs_baseline": N,
   "spectral_conv_fwdbwd_ms_64modes": N, ...roofline fields...}

Config matches the reference's NS-128² training north star
(/root/reference/config/navier_stokes_config.py:10-40 + config/models.py:58-68):
FNO, n_modes 64x64, hidden 64, 4 layers, projection ratio 4, batch 8,
H1 train loss, AdamW — full jitted train step (fwd+bwd+update).

Baseline derivation (see BASELINE.md "Baseline derivation"): the reference
publishes no wall-clock numbers; the A100 PyTorch estimate for this config
is ~40 train steps/sec (eager per-op launch overhead + unfused complex
einsums dominate; the analytic FLOP count of the step is ~27 GFLOP, so
40 steps/s is ~1.1 TFLOPS effective — single-digit-percent A100
utilization, which matches eager-mode FNO practice). That estimate
assumed the reference trainer's FULL per-step rel-H1, so ``vs_baseline``
is ``steps_per_sec_full_h1`` (same workload, measured every run) divided
by 40; the headline ``value`` is the production device-dataset path with
its precomputed H1 denominator (``h1_denominator`` field), and
``vs_baseline_production_path`` is that value over the same 40.
The roofline fields report achieved FLOPS
against the same-process measured matmul ceiling of this (time-shared,
axon-relayed) chip so the utilization claim is principled.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_A100_STEPS_PER_SEC = 40.0

# NS-128 bench model config
BATCH, RES, HIDDEN, LAYERS, MODES = 8, 128, 64, 4, 64


def analytic_step_flops(batch: int = BATCH) -> float:
    """Analytic FLOPs of one train step (fwd+bwd ~= 3x fwd).

    Counts the spectral contractions (4 real MACs per complex MAC), the
    FFTs (~5 N log2 N per transformed axis), and the lifting/projection/
    channel MLPs. Matches training/profiling.py conventions.
    """
    m_kept = MODES * (MODES // 2 + 1)  # rfft half-spectrum block
    contraction = 4 * 2 * batch * HIDDEN * HIDDEN * m_kept  # per layer
    n_pix = RES * RES
    fft = 2 * 5 * batch * HIDDEN * n_pix * np.log2(n_pix)  # rfft+irfft
    skip = 2 * batch * HIDDEN * HIDDEN * n_pix  # 1x1 conv skip
    mlp = 2 * 2 * batch * HIDDEN * HIDDEN * n_pix  # channel MLP (2 layers)
    per_layer = contraction + fft + skip + mlp
    lifting = 2 * batch * n_pix * (3 * 256 + 256 * HIDDEN)
    projection = 2 * batch * n_pix * (HIDDEN * 256 + 256 * 1)
    fwd = LAYERS * per_layer + lifting + projection
    return 3.0 * fwd


def measure_matmul_ceiling(dtype=jnp.bfloat16, n=2048, iters=64) -> float:
    """Observed matmul TFLOPS ceiling on this chip (time-shared -> noisy).

    All iterations run inside ONE jitted fori_loop: per-call dispatch over
    the axon relay costs ~10s of ms, which would swamp per-op timings.
    """
    a = jnp.asarray(np.random.RandomState(0).randn(n, n), dtype)
    b = jnp.asarray(np.random.RandomState(1).randn(n, n), dtype)

    @jax.jit
    def chain(a, b):
        def body(_, x):
            return ((x @ b) * jnp.asarray(1e-3, dtype)).astype(dtype)

        return jax.lax.fori_loop(0, iters, body, a)

    float(jnp.sum(chain(a, b).astype(jnp.float32)))  # compile + barrier
    t0 = time.perf_counter()
    float(jnp.sum(chain(a, b).astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return 2 * n**3 * iters / dt / 1e12


def bench_spectral_conv(precision: str, n_iters: int = 30) -> float:
    """SpectralConv fwd+bwd latency (ms) at 64^2 modes, res 128 — the
    second BASELINE.json metric."""
    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv

    conv = SpectralConv(
        in_channels=HIDDEN,
        out_channels=HIDDEN,
        n_modes=(MODES, MODES),
        fno_block_precision=precision,
    )
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(BATCH, HIDDEN, RES, RES), jnp.float32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(conv.apply(p, xx) ** 2)

    @jax.jit
    def chain(params, x):
        # n_iters of fwd+bwd inside one program: isolates device latency
        # from the relay's per-dispatch overhead
        def body(_, cur):
            gx = jax.grad(loss, argnums=1)(params, cur)
            return 0.5 * cur + 1e-3 * gx

        return jax.lax.fori_loop(0, n_iters, body, x)

    float(chain(params, x)[0, 0, 0, 0])  # compile + completion barrier
    t0 = time.perf_counter()
    float(chain(params, x)[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    return dt / n_iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="dense-contraction backend")
    p.add_argument("--block-precision", default="mixed",
                   choices=["full", "mixed"],
                   help="SpectralConv contraction precision")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--skip-aux", action="store_true",
                   help="skip the conv-latency and roofline measurements")
    p.add_argument("--opt-state", default="factored",
                   choices=["full", "bf16mu", "factored", "factored8"],
                   help="AdamW state policy: full f32, bf16 first moment, "
                        "factored second moment + bf16 mu, or factored + "
                        "blockwise-int8 mu (cuts optimizer-state HBM "
                        "traffic; A/B in BASELINE.md)")
    p.add_argument("--batch", type=int, default=BATCH,
                   help="batch size (throughput scales reported per-step "
                        "at the reference batch of 8 by default)")
    p.add_argument("--sr", action="store_true",
                   help="all-bf16 master params updated with stochastic "
                        "rounding (apply_updates_sr): removes the "
                        "remaining f32 param read+write from the update "
                        "phase")
    args = p.parse_args()

    # The shared TPU worker can be down for an hour-plus. Probe it from a
    # SUBPROCESS (an in-process hang cannot be interrupted) with retries,
    # and emit an honest error line instead of hanging the caller forever.
    # The retry budget (20 min) + probe timeout must stay WELL INSIDE the
    # driver's outer timeout: round 4's 3600 s budget got the whole bench
    # SIGKILLed before it could emit its error JSON (BENCH_r04 rc=124).
    import subprocess

    deadline = time.time() + 1200
    attempt = quick_failures = 0
    last_stderr = ""
    while True:
        t_probe = time.time()
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jax.jit(lambda a:(a@a).sum())"
                 "(jnp.ones((128,128),jnp.bfloat16))))"],
                capture_output=True, timeout=600,
            )
            ok = probe.returncode == 0
            last_stderr = probe.stderr.decode(errors="replace")[-500:]
        except subprocess.TimeoutExpired:
            ok = False
            last_stderr = "probe timeout (900s) — worker unreachable"
        attempt += 1
        if ok:
            break
        # a probe that fails in seconds is a broken environment, not an
        # outage — don't burn an hour retrying it
        if time.time() - t_probe < 60:
            quick_failures += 1
        reason = (
            "probe_failing_fast_environment_broken"
            if quick_failures >= 3
            else f"tpu_unreachable_after_{attempt}_probes_20min"
        )
        if quick_failures >= 3 or time.time() + 60 > deadline:
            print(json.dumps({
                "metric": "ns128_fno_train_steps_per_sec",
                "value": None, "unit": "steps/sec", "vs_baseline": None,
                "error": reason, "probe_stderr": last_stderr,
            }))
            sys.exit(1)
        print(f"[bench] TPU probe {attempt} failed; retrying "
              f"(deadline in {int(deadline - time.time())}s)",
              file=sys.stderr, flush=True)
        time.sleep(60)

    import optax

    from neuraloperator_tpu.losses import H1Loss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.ops.contractions import set_contraction_backend
    from neuraloperator_tpu.training import setup
    from neuraloperator_tpu.training.optimizer import adamw as adamw_factory

    # TF32-class matmul precision: 4e-5 max rel err vs f32 on FNO forward,
    # mirroring the reference's A100 TF32 training configuration
    setup(matmul_precision="tensorfloat32")
    set_contraction_backend(args.backend)

    model = FNO(
        n_modes=(MODES, MODES),
        in_channels=1,
        out_channels=1,
        hidden_channels=HIDDEN,
        n_layers=LAYERS,
        projection_channel_ratio=4,
        # bf16 spectral-weight storage halves HBM weight traffic; 'mixed'
        # runs bf16 contraction operands with f32 accumulation (MXU-native).
        # Quality: H1 parity with f32 at 120 NS-64 epochs, final L2 ~10%
        # (rel) behind — see BASELINE.md "Mixed-precision quality study"
        weight_dtype="bfloat16",
        fno_block_precision=args.block_precision,
    )
    rng = np.random.RandomState(0)
    batch = args.batch
    x = jnp.asarray(rng.randn(batch, 1, RES, RES), jnp.float32)
    y = jnp.asarray(rng.randn(batch, 1, RES, RES), jnp.float32)

    # jit the init: eager init would execute complex intermediates op-by-op,
    # which restricted TPU runtimes cannot handle at this size
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    if args.opt_state == "full":
        opt = optax.adamw(3e-4)
    elif args.opt_state == "bf16mu":
        opt = optax.adamw(3e-4, mu_dtype=jnp.bfloat16)
    elif args.opt_state == "factored8":
        # factored nu + blockwise-int8 mu: least state traffic of all
        opt = adamw_factory(3e-4, factored_second_moment=True,
                            mu_dtype="int8",
                            cast_final_updates=not args.sr)
    else:  # factored second moment + bf16 mu
        opt = adamw_factory(
            3e-4, factored_second_moment=True, mu_dtype=jnp.bfloat16,
            cast_final_updates=not args.sr,
        )
    # statistics always init from an f32-promoted tree (optax derives
    # state dtypes from param dtypes; bf16 nu would freeze — see
    # training/optimizer.py). The factored kernel forces f32 nu itself;
    # this covers the plain-optax paths too.
    opt_state = opt.init(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
    )
    h1 = H1Loss(d=2)

    # bf16 mixed precision (Trainer mixed_precision=True semantics):
    # forward/backward in bf16 with f32 master weights
    def to_half(a):
        return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a

    if args.sr:
        # bf16 master params; optimizer STATE stays initialized from the
        # f32 tree (opt_state above) — optax derives state dtypes from
        # param dtypes and a bf16 nu freezes once (1-b2)*g^2 is below
        # bf16 relative precision. SR removes the f32 parameter copy
        # only; the statistics keep their dtypes.
        params = jax.tree_util.tree_map(to_half, params)

    # the H1 rel-denominator depends only on the target — precomputed per
    # sample, exactly as the Trainer's device-dataset path stages it
    # (one FD stencil pass per step on the difference instead of two)
    ynorm = jax.jit(h1.ynorm_sq)(y)

    def train_step(params, opt_state, xx, yy, yn, sr_key=None):
        def loss_fn(p):
            p = jax.tree_util.tree_map(to_half, p)
            out = model.apply({"params": p}, to_half(xx))
            # yn=None -> the reference trainer's full per-step rel-H1
            # (denominator recomputed in-step); yn given -> the Trainer
            # device-dataset path's precomputed denominator
            return h1(out.astype(jnp.float32), yy, ynorm_sq=yn)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        if sr_key is not None:
            from neuraloperator_tpu.training.optimizer import (
                apply_updates_sr,
            )

            return (
                apply_updates_sr(params, updates, sr_key),
                opt_state,
                loss,
            )
        return optax.apply_updates(params, updates), opt_state, loss

    # donate params/opt_state exactly like the Trainer's production step
    # (trainer.py donate_argnums=(0, 1)): the update can then write in
    # place instead of allocating fresh parameter/state buffers
    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    sr_base = jax.random.PRNGKey(0)
    sr_counter = [0]

    def step(params, opt_state, xx, yy, yn):
        if not args.sr:
            return jit_step(params, opt_state, xx, yy, yn)
        sr_counter[0] += 1
        return jit_step(
            params, opt_state, xx, yy, yn,
            jax.random.fold_in(sr_base, sr_counter[0]),
        )

    # warmup (compile); transfer the loss to force full completion — on the
    # relayed TPU runtime block_until_ready alone does not wait for compute
    params, opt_state, loss = step(params, opt_state, x, y, ynorm)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = step(params, opt_state, x, y, ynorm)
    final_loss = float(loss)  # host transfer = true completion barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    steps_per_sec = args.iters / dt

    # Comparability workload (BASELINE.md "Round-4: H1 workload note"):
    # the same step with the reference trainer's FULL per-step rel-H1
    # (denominator recomputed in-step, two FD stencil passes). This is
    # the workload the A100 vs_baseline derivation assumed and the one
    # BENCH_r01-r03 timed, so vs_baseline anchors to it; the headline
    # `value` stays the production device-dataset path (precomputed
    # denominator), flagged by `h1_denominator`.
    jit_step_full = jax.jit(
        lambda p, s, xx, yy, *sk: train_step(p, s, xx, yy, None, *sk),
        donate_argnums=(0, 1),
    )

    def step_full(params, opt_state, xx, yy):
        if not args.sr:
            return jit_step_full(params, opt_state, xx, yy)
        sr_counter[0] += 1
        return jit_step_full(
            params, opt_state, xx, yy,
            jax.random.fold_in(sr_base, sr_counter[0]),
        )

    params, opt_state, loss = step_full(params, opt_state, x, y)
    float(loss)  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = step_full(params, opt_state, x, y)
    float(loss)
    steps_per_sec_full = args.iters / (time.perf_counter() - t0)

    # headline `value` = the FULL-H1 workload: the one the A100 baseline
    # derivation assumed and the one BENCH_r01-r03 timed (cross-round
    # continuity). The production device-dataset path (precomputed
    # denominator) is reported alongside.
    result = {
        "metric": "ns128_fno_train_steps_per_sec",
        "value": round(steps_per_sec_full, 3),
        "unit": "steps/sec",
        "vs_baseline": round(
            steps_per_sec_full / BASELINE_A100_STEPS_PER_SEC, 3
        ),
        "steps_per_sec_precomputed_h1": round(steps_per_sec, 3),
        "vs_baseline_production_path": round(
            steps_per_sec / BASELINE_A100_STEPS_PER_SEC, 3
        ),
        "h1_denominator_of_value": "full",
    }

    if not args.skip_aux:
        # contention guard: the chip is time-shared, so a ceiling measured
        # while another tenant runs understates the chip and can push
        # mfu_vs_observed_ceiling past 1. Bracket the aux timings with two
        # ceiling measurements, publish the max, and self-describe runs
        # whose two measurements disagree (or whose implied MFU is
        # implausible for this bandwidth-bound step) as contended.
        ceiling_pre = measure_matmul_ceiling()

        # device-only steps/s: the same step iterated inside ONE program —
        # isolates compute from the relay's per-dispatch overhead, which
        # bounds the python-loop number at ~35-40 dispatches/s
        k_inner = 30

        @jax.jit
        def steps_chain(params, opt_state, xx, yy, yn):
            def body(i, carry):
                p, s, _ = carry
                if args.sr:
                    return train_step(
                        p, s, xx, yy, yn, jax.random.fold_in(sr_base, i)
                    )
                return train_step(p, s, xx, yy, yn)

            return jax.lax.fori_loop(
                0, k_inner, body, (params, opt_state, jnp.float32(0))
            )

        params, opt_state, loss = steps_chain(params, opt_state, x, y, ynorm)
        float(loss)  # compile + barrier
        t0 = time.perf_counter()
        params, opt_state, loss = steps_chain(params, opt_state, x, y, ynorm)
        float(loss)
        device_steps_per_sec = k_inner / (time.perf_counter() - t0)

        # forward-only (serving) latency: jitted inference chained inside
        # one program, batch as configured
        @jax.jit
        def infer_chain(params, xx):
            def body(_, cur):
                out = model.apply(
                    {"params": jax.tree_util.tree_map(to_half, params)},
                    to_half(cur),
                )
                return jnp.broadcast_to(
                    out.astype(jnp.float32), cur.shape
                ) * 1e-3 + cur

            return jax.lax.fori_loop(0, k_inner, body, xx)

        float(infer_chain(params, x)[0, 0, 0, 0])  # compile + barrier
        t0 = time.perf_counter()
        float(infer_chain(params, x)[0, 0, 0, 0])
        infer_ms = (time.perf_counter() - t0) / k_inner * 1e3

        # serving-throughput operating point: forward-only at batch 64
        # (weights stream once per 8x the samples of the batch-8 row;
        # the saturating-batch analogue of the training sweep below)
        infer_ms_b64 = None
        if batch == 8:
            x64 = jnp.asarray(rng.randn(64, 1, RES, RES), jnp.float32)
            float(infer_chain(params, x64)[0, 0, 0, 0])  # compile
            t0 = time.perf_counter()
            float(infer_chain(params, x64)[0, 0, 0, 0])
            infer_ms_b64 = (time.perf_counter() - t0) / k_inner * 1e3

        # samples/s at batch 16: throughput saturates at ~700 samples/s
        # for batch >= 16 on this model shape (BASELINE.md round-3 sweep) —
        # that saturation point is the honest capacity metric for a
        # bandwidth-bound 64-channel model, so it is published in every
        # bench run next to the reference-batch steps/s headline.
        big_batch_rows = {}
        if batch == 8:
            # larger batches amortize the fixed per-step cost (AdamW state
            # traffic ~2.6 ms + loss/copy slice) over more samples — the
            # honest capacity operating point for a bandwidth-bound
            # 64-channel model. batch 16 keeps cross-round continuity;
            # batch 32 is where MFU peaks (opt traffic per sample halves
            # again).
            # step donates its (params, opt_state) args, so thread a
            # rolling state through the batch sizes instead of reusing
            # the (deleted-after-first-call) originals
            p_cur, s_cur = params, opt_state
            for bb in (16, 32):
                xb = jnp.asarray(rng.randn(bb, 1, RES, RES), jnp.float32)
                yb = jnp.asarray(rng.randn(bb, 1, RES, RES), jnp.float32)
                ynb = jax.jit(h1.ynorm_sq)(yb)
                pb, sb, lossb = step(p_cur, s_cur, xb, yb, ynb)
                float(lossb)  # compile + barrier
                nb = max(args.iters // 2, 10)
                t0 = time.perf_counter()
                for _ in range(nb):
                    pb, sb, lossb = step(pb, sb, xb, yb, ynb)
                float(lossb)
                samples_b = bb * nb / (time.perf_counter() - t0)

                # device-only rate at this batch (steps_chain re-jits for
                # the new shape)
                _, _, lb = steps_chain(pb, sb, xb, yb, ynb)
                float(lb)  # compile + barrier
                t0 = time.perf_counter()
                _, _, lb = steps_chain(pb, sb, xb, yb, ynb)
                float(lb)
                device_steps_b = k_inner / (time.perf_counter() - t0)
                big_batch_rows[bb] = (samples_b, device_steps_b)
                p_cur, s_cur = pb, sb  # steps_chain does not donate

        conv_ms = bench_spectral_conv(args.block_precision)
        ceiling_post = measure_matmul_ceiling()
        ceiling = max(ceiling_pre, ceiling_post)
        ceiling_spread = abs(ceiling_pre - ceiling_post) / ceiling
        flops = analytic_step_flops(batch)
        achieved = flops * device_steps_per_sec / 1e12
        # this step is bandwidth-bound at ~0.16 MFU on a quiet chip
        # (BASELINE.md roofline); >0.5 means the ceiling itself was
        # depressed by a co-tenant mid-measurement
        # bool(): numpy comparison results (np.bool_) are not JSON
        # serializable and would crash the final print
        contended = bool(
            ceiling_spread > 0.25 or achieved / ceiling > 0.5
        )
        result.update(
            {
                "samples_per_sec": round(steps_per_sec_full * batch, 1),
                **{
                    k: v
                    for bb, (samples_b, device_steps_b) in
                    big_batch_rows.items()
                    for k, v in {
                        f"samples_per_sec_batch{bb}": round(samples_b, 1),
                        f"device_steps_per_sec_batch{bb}": round(
                            device_steps_b, 3
                        ),
                        f"achieved_tflops_batch{bb}": round(
                            analytic_step_flops(bb) * device_steps_b / 1e12,
                            3,
                        ),
                        f"mfu_batch{bb}_vs_observed_ceiling": round(
                            analytic_step_flops(bb)
                            * device_steps_b
                            / 1e12
                            / ceiling,
                            4,
                        ),
                    }.items()
                },
                **(
                    {
                        "mfu_saturating_batch": round(
                            max(
                                analytic_step_flops(bb) * ds / 1e12 / ceiling
                                for bb, (_, ds) in big_batch_rows.items()
                            ),
                            4,
                        )
                    }
                    if big_batch_rows
                    else {}
                ),
                "device_steps_per_sec": round(device_steps_per_sec, 3),
                "infer_ms_batch": round(infer_ms, 3),
                "infer_samples_per_sec": round(batch / infer_ms * 1e3, 1),
                **(
                    {
                        "infer_ms_batch64": round(infer_ms_b64, 3),
                        "infer_samples_per_sec_batch64": round(
                            64 / infer_ms_b64 * 1e3, 1
                        ),
                    }
                    if infer_ms_b64 is not None
                    else {}
                ),
                "spectral_conv_fwdbwd_ms_64modes": round(conv_ms, 3),
                "step_gflops_analytic": round(flops / 1e9, 1),
                "achieved_tflops": round(achieved, 3),
                "matmul_ceiling_tflops_bf16": round(ceiling, 2),
                "ceiling_spread": round(ceiling_spread, 3),
                "contended": contended,
                "mfu_vs_observed_ceiling": round(achieved / ceiling, 4),
                "backend": args.backend,
                "opt_state": args.opt_state,
                "sr": args.sr,
                "batch": batch,
                "block_precision": args.block_precision,
                # device/batch16 measurements use the production
                # precomputed-denominator step; the headline `value` and
                # samples_per_sec use the full per-step rel-H1 — see
                # BASELINE.md "Round-4: H1 workload note" + round-5
                # re-anchor
                "h1_denominator": {
                    "value": "full",
                    "device_steps": "precomputed",
                },
            }
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
