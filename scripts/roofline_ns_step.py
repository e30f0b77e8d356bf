"""Per-op roofline table for the NS-128 bench train step.

Answers "is the residual device time reducible?" with numbers instead of
vibes: runs the exact bench.py train step (fori_loop-chained inside one
program) under ``jax.profiler``, aggregates the XLA-op trace into
categories, and compares each category's measured time against its
roofline floor on the SAME chip:

  - matmul-shaped work -> analytic FLOPs / measured bf16 matmul ceiling
  - state/elementwise work -> bytes touched / measured HBM copy bandwidth

Both ceilings are measured in-process (the chip is time-shared and
relay-attached, so nominal specs are meaningless here). Prints one JSON
line per category plus a summary; paste the table into BASELINE.md.

Run on the real chip: ``python scripts/roofline_ns_step.py``.
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import (
    BATCH,
    HIDDEN,
    LAYERS,
    MODES,
    RES,
    analytic_step_flops,
    measure_matmul_ceiling,
)


def measure_hbm_bandwidth(mb: int = 256, iters: int = 64) -> float:
    """Measured HBM copy bandwidth (GB/s): read+write of a large array
    chained inside one program."""
    n = mb * 1024 * 1024 // 4
    x = jnp.zeros((n,), jnp.float32) + 1.0

    @jax.jit
    def chain(x):
        def body(_, cur):
            return cur * 1.0000001  # read n*4 bytes + write n*4 bytes

        return jax.lax.fori_loop(0, iters, body, x)

    float(chain(x)[0])  # compile + barrier
    t0 = time.perf_counter()
    float(chain(x)[0])
    dt = time.perf_counter() - t0
    return 2 * n * 4 * iters / dt / 1e9


CATEGORIES = (
    # (category, substrings matched against the XLA op name / tf_op)
    ("pallas_contraction", ("custom-call", "spectral", "karatsuba")),
    ("dot_transforms_mlp", ("dot", "conv", "einsum")),
    ("optimizer_state", ("adam", "factored", "opt", "mul.grad")),
    ("converts_copies", ("convert", "copy", "bitcast", "transpose")),
    ("slices_pads", ("slice", "pad", "concatenate", "gather", "scatter")),
    ("loss_elementwise", ("add", "sub", "mul", "div", "rsqrt", "reduce",
                          "loop_", "fusion")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def parse_trace(logdir: str):
    """Aggregate device-op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device processes: pid whose name mentions TPU / device
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_name.items()
        if "TPU" in n or "/device" in n.lower()
    }
    def collect(thread_filter):
        per_op = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") != "X":
                continue
            tname = tid_name.get((e["pid"], e["tid"]), "")
            if not thread_filter(e.get("pid"), tname):
                continue
            # tf_op carries the originating JAX source path (semantic
            # attribution: optimizer vs model vs loss); raw HLO name is
            # the fallback
            key = e.get("args", {}).get("tf_op") or e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            per_op[key] += dur
            total += dur
        return per_op, total

    # strict: device process, "XLA Ops" thread (TPU naming)
    per_op, total = collect(
        lambda pid, tn: pid in device_pids and "XLA Ops" in tn
    )
    if not per_op:  # fallback (e.g. CPU traces): any XLA-named thread
        per_op, total = collect(
            lambda pid, tn: "XLA" in tn and "python" not in tn.lower()
        )
    return per_op, total


def main():
    import argparse

    import optax

    from neuraloperator_tpu.losses import H1Loss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import setup
    from neuraloperator_tpu.training.optimizer import adamw as adamw_factory

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (CI/CPU): exercises the full "
                         "profile+parse+roofline path, numbers meaningless")
    args = ap.parse_args()

    setup(matmul_precision="tensorfloat32")

    hidden, res, modes, layers = (
        (16, 32, 8, 2) if args.smoke else (HIDDEN, RES, MODES, LAYERS)
    )

    model = FNO(
        n_modes=(modes, modes), in_channels=1, out_channels=1,
        hidden_channels=hidden, n_layers=layers,
        projection_channel_ratio=4, weight_dtype="bfloat16",
        fno_block_precision="mixed",
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, 1, res, res), jnp.float32)
    y = jnp.asarray(rng.randn(BATCH, 1, res, res), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    opt = adamw_factory(3e-4, factored_second_moment=True,
                        mu_dtype=jnp.bfloat16)
    opt_state = opt.init(params)
    h1 = H1Loss(d=2)

    def to_half(a):
        return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a

    def train_step(params, opt_state, xx, yy):
        def loss_fn(p):
            p = jax.tree_util.tree_map(to_half, p)
            out = model.apply({"params": p}, to_half(xx))
            return h1(out.astype(jnp.float32), yy)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    k_inner = 4 if args.smoke else 30

    @jax.jit
    def steps_chain(params, opt_state, xx, yy):
        def body(_, carry):
            p, s, _ = carry
            return train_step(p, s, xx, yy)

        return jax.lax.fori_loop(
            0, k_inner, body, (params, opt_state, jnp.float32(0))
        )

    # compile + warm
    p2, s2, loss = steps_chain(params, opt_state, x, y)
    float(loss)
    t0 = time.perf_counter()
    p2, s2, loss = steps_chain(params, opt_state, x, y)
    float(loss)
    wall_ms = (time.perf_counter() - t0) / k_inner * 1e3

    logdir = "/tmp/roofline_trace"
    with jax.profiler.trace(logdir):
        p2, s2, loss = steps_chain(params, opt_state, x, y)
        float(loss)

    per_op, total = parse_trace(logdir)
    per_step_scale = 1.0 / k_inner

    # top ops
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    print("# top XLA ops (ms per step)")
    for name, ms in top:
        print(json.dumps({"op": name[:100],
                          "ms": round(ms * per_step_scale, 4)}))

    cats = defaultdict(float)
    for name, ms in per_op.items():
        cats[categorize(name)] += ms * per_step_scale
    print("# category totals (ms per step)")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat, "ms": round(ms, 3)}))

    # ceilings measured on the same chip, same process
    if args.smoke:
        mm_ceiling = measure_matmul_ceiling(n=256, iters=4)
        hbm_gbps = measure_hbm_bandwidth(mb=32, iters=4)
    else:
        mm_ceiling = measure_matmul_ceiling()
        hbm_gbps = measure_hbm_bandwidth()

    # exact executed FLOPs/bytes of ONE step from XLA cost analysis —
    # the rigorous roofline numerator (the analytic count assumes FFTs;
    # the truncated-DFT formulation trades more MXU FLOPs for less
    # bandwidth, so executed > analytic by design)
    from neuraloperator_tpu.utils import count_flops

    xla_cost = count_flops(train_step, params, opt_state, x, y)
    xla_flops = xla_cost["flops"]
    xla_bytes = xla_cost["bytes_accessed"]

    # roofline floors
    flops = analytic_step_flops(BATCH)
    dot_floor_ms = flops / (mm_ceiling * 1e12) * 1e3
    xla_compute_floor_ms = (
        xla_flops / (mm_ceiling * 1e12) * 1e3
        if np.isfinite(xla_flops) else float("nan")
    )
    xla_bw_floor_ms = (
        xla_bytes / (hbm_gbps * 1e9) * 1e3
        if np.isfinite(xla_bytes) else float("nan")
    )
    # optimizer: params ~ 69.3M; per step reads params f32 + mu bf16 +
    # factored nu (~negligible) + grads bf16->f32, writes params + mu
    n_params = sum(
        int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params)
    )
    opt_bytes = n_params * (4 + 4 + 2 + 2 + 4)  # r/w params, r/w mu, grads
    opt_floor_ms = opt_bytes / (hbm_gbps * 1e9) * 1e3
    # loss + activations traffic: in/out fields + H1 FD stencils, bf16
    act_bytes = BATCH * RES * RES * (HIDDEN * 2 * 2 * LAYERS)  # rough
    act_floor_ms = act_bytes / (hbm_gbps * 1e9) * 1e3

    print(json.dumps({
        "wall_ms_per_step": round(wall_ms, 3),
        "device_trace_ms_per_step": round(total * per_step_scale, 3),
        "matmul_ceiling_tflops_bf16": round(mm_ceiling, 2),
        "hbm_copy_bandwidth_gbps": round(hbm_gbps, 1),
        "analytic_step_gflops": round(flops / 1e9, 1),
        "xla_executed_gflops": round(xla_flops / 1e9, 1),
        "xla_bytes_accessed_gb": round(xla_bytes / 1e9, 3),
        "floor_ms_xla_compute": round(xla_compute_floor_ms, 3),
        "floor_ms_xla_bandwidth": round(xla_bw_floor_ms, 3),
        "floor_ms_matmul_work": round(dot_floor_ms, 3),
        "floor_ms_optimizer_state": round(opt_floor_ms, 3),
        "floor_ms_block_activations_rough": round(act_floor_ms, 3),
        "n_params": n_params,
    }))


if __name__ == "__main__":
    main()
