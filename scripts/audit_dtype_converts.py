"""Audit dtype-convert traffic in the bench NS-128 train step.

Builds the EXACT bench.py train step (FNO Medium2d shape, bf16 stored
weights, mixed block precision, factored-nu AdamW, precomputed-H1),
lowers it, and enumerates every `convert` in the optimized HLO with its
shape and byte cost — the concrete list behind the roofline table's
"converts/copies" slice (BASELINE.md round-3 roofline; VERDICT round-3
item #4 asked for exactly this audit).

Run on CPU (`PYTHONPATH= JAX_PLATFORMS=cpu python scripts/audit_dtype_converts.py`):
convert placement is decided at trace level and by target-independent
simplification, so the inventory of *materialized* boundary converts is
representative; TPU-only fusion differences are noted where relevant.

Findings (recorded 2026-08-19, this script's output):
- ZERO standalone convert instructions survive in the optimized ENTRY
  computation: every bf16<->f32 boundary (grads -> f32 statistics,
  f32 updates -> bf16 apply, loss-input upcast) fuses into its consumer.
- Every module boundary in the forward is bf16 (verified with
  capture_intermediates below): no silent f32 promotion anywhere in
  lifting -> blocks -> projection under the mixed policy.
- The large f32 intermediates the CPU HLO shows are the exact-erf GELU's
  internal upcast (erf has no bf16 kernel; jax.nn.gelu downcasts the
  result) — a purely elementwise chain that TPU XLA fuses into a single
  kernel, costed in the roofline's "loss + elementwise" slice, not
  converts.
- Remaining TPU "converts/copies" time is therefore structural: the
  Pallas-adapter HBM relayout copies around the spectral contraction
  (~3% of step, measured round 2 and judged not worth layout surgery)
  plus fused boundary converts that cost no extra HBM pass.
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH, RES, MODES, HIDDEN, LAYERS = 8, 128, 64, 64, 4

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1, "u8": 1,
               "u32": 4, "pred": 1, "f64": 8}


def build_step():
    from neuraloperator_tpu.losses import H1Loss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import setup
    from neuraloperator_tpu.training.optimizer import adamw as adamw_factory

    setup(matmul_precision="tensorfloat32")
    model = FNO(
        n_modes=(MODES, MODES), in_channels=1, out_channels=1,
        hidden_channels=HIDDEN, n_layers=LAYERS,
        projection_channel_ratio=4,
        weight_dtype="bfloat16", fno_block_precision="mixed",
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, 1, RES, RES), jnp.float32)
    y = jnp.asarray(rng.randn(BATCH, 1, RES, RES), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    opt = adamw_factory(3e-4, factored_second_moment=True,
                        mu_dtype=jnp.bfloat16)
    opt_state = opt.init(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params))
    h1 = H1Loss(d=2)
    ynorm = jax.jit(h1.ynorm_sq)(y)

    def to_half(a):
        return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a

    def train_step(params, opt_state, xx, yy, yn):
        def loss_fn(p):
            p = jax.tree_util.tree_map(to_half, p)
            out = model.apply({"params": p}, to_half(xx))
            return h1(out.astype(jnp.float32), yy, ynorm_sq=yn)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step, (params, opt_state, x, y, ynorm)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=0,
                    help="also print the N largest ENTRY converts/copies")
    args_cli = ap.parse_args()

    step, args = build_step()
    lowered = jax.jit(step).lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # Only ENTRY-computation (top-level, unfused) converts materialize
    # HBM traffic; converts inside %fused_computation bodies are free.
    entry = hlo[hlo.index("ENTRY "):]
    entry = entry[: entry.index("\n}") + 2]
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?\S+ = (\w+)\[([\d,]*)\][^ ]* convert\(",
        re.M)
    totals = defaultdict(lambda: [0, 0.0])
    for m in pat.finditer(entry):
        dt, shape = m.group(1), m.group(2)
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        mb = n * DTYPE_BYTES.get(dt, 4) / 1e6
        key = f"->{dt}"
        totals[key][0] += 1
        totals[key][1] += mb

    print("standalone convert instructions in optimized HLO ENTRY:")
    grand = 0.0
    for key, (cnt, mb) in sorted(totals.items(), key=lambda kv: -kv[1][1]):
        print(f"  {key:8s} x{cnt:4d}  {mb:10.2f} MB written")
        grand += mb
    print(f"  total standalone-convert output bytes: {grand:.1f} MB")

    # copy ops (layout relayouts) and fusions whose ROOT is a convert:
    # both materialize boundary bytes even though no standalone convert
    # instruction remains
    cpat = re.compile(
        r"^\s*(?:ROOT\s+)?%?\S+ = (\w+)\[([\d,]*)\][^ ]* copy\(", re.M)
    cmb = cnt = 0
    for m in cpat.finditer(entry):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        cmb += n * DTYPE_BYTES.get(m.group(1), 4) / 1e6
        cnt += 1
    print(f"copy instructions in ENTRY: x{cnt}, {cmb:.1f} MB written")

    # fusion outputs by dtype: how many bytes of f32 intermediates are
    # materialized between fusions (the real cost of an unfused boundary
    # is an f32 intermediate where bf16 would do)
    fpat = re.compile(
        r"^\s*(?:ROOT\s+)?%?\S+ = (\w+)\[([\d,]*)\][^ ]* fusion\(", re.M)
    fmb = defaultdict(float)
    for m in fpat.finditer(entry):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        fmb[m.group(1)] += n * DTYPE_BYTES.get(m.group(1), 4) / 1e6
    print("fusion output bytes by dtype (materialized intermediates):")
    for dt, mb in sorted(fmb.items(), key=lambda kv: -kv[1]):
        print(f"  {dt:8s} {mb:10.1f} MB")

    if args_cli.top:
        rows = []
        allpat = re.compile(
            r"^\s*(?:ROOT\s+)?%?(\S+) = (\w+)\[([\d,]*)\][^ ]* "
            r"(convert|copy|fusion|transpose|bitcast)\(", re.M)
        for mm in allpat.finditer(entry):
            name, dt, shape, op = mm.groups()
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            rows.append((n * DTYPE_BYTES.get(dt, 4) / 1e6,
                         f"{dt}[{shape}]", op, name[:70]))
        rows.sort(reverse=True)
        print(f"\ntop {args_cli.top} ENTRY ops by output bytes:")
        for mb, sig, op, name in rows[: args_cli.top]:
            print(f"  {mb:9.1f} MB  {op:9s} {sig}  {name}")

    # module-boundary dtype trace at reduced shape: catches any silent
    # f32 promotion between modules (round-2's +35% bug class)
    from neuraloperator_tpu.models import FNO
    small = FNO(n_modes=(16, 16), in_channels=1, out_channels=1,
                hidden_channels=64, n_layers=4, projection_channel_ratio=4,
                weight_dtype="bfloat16", fno_block_precision="mixed")
    xs = jnp.zeros((2, 1, 32, 32), jnp.float32)
    ps = jax.jit(small.init)(jax.random.PRNGKey(0), xs)["params"]
    ps = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        ps)

    def fwd(p, xx):
        return small.apply({"params": p}, xx.astype(jnp.bfloat16),
                           capture_intermediates=True,
                           mutable=["intermediates"])

    _, inter = jax.jit(fwd)(ps, xs)
    bad = []

    def walk(t, prefix=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, prefix + "/" + k)
        elif isinstance(t, tuple):
            for v in t:
                walk(v, prefix)
        elif t.dtype != jnp.bfloat16:
            bad.append((prefix, str(t.dtype)))

    walk(inter["intermediates"])
    if bad:
        print("\nNON-bf16 module boundaries (silent promotion!):")
        for name, dt in bad:
            print(f"  {name}: {dt}")
    else:
        print("\nall module boundaries bf16: no silent f32 promotion")

    # per-parameter-tree accounting: the big boundaries
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(args[0]))
    print(f"\nparam count: {n_params/1e6:.1f}M (bf16 stored = "
          f"{2*n_params/1e6:.0f} MB)")
    print("expected per-step boundary traffic at trace level:")
    print(f"  grads bf16 produced -> f32 for nu/mu stats: "
          f"{4*n_params/1e6:.0f} MB written if materialized")
    print(f"  updates f32 -> bf16 apply: {2*n_params/1e6:.0f} MB written "
          f"if materialized")


if __name__ == "__main__":
    main()
