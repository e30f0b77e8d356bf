"""Microbench: factorized (Tucker) vs dense spectral contraction on TPU.

VERDICT/BASELINE follow-up: TFNO (Tucker rank 0.1) does ~10x fewer FLOPs
than dense in the mode contraction, so its train step should NOT be slower
than dense. This bench isolates the contraction fwd+bwd at the NS-128
bench shapes and reports ms + achieved TFLOPS vs the analytic FLOP count,
for: dense Pallas kernel, dense packed-einsum XLA, Tucker factorized
(complex_einsum chain, now Karatsuba 3-matmul), and Tucker reconstructed.

Usage: python scripts/bench_tfno_contraction.py [--iters 50]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

B, CIN, COUT, M1, M2 = 8, 64, 64, 64, 33  # bench-size kept-mode block


def timed(fn, *args, iters=50):
    """Median ms/iter with a chained fori_loop (single dispatch)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(_, a):
            outs = fn(*a)
            # feed a scalar of the output back so iterations chain
            eps = 1e-30 * sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(outs))
            return tuple(
                x + eps.astype(x.dtype) if i == 0 else x
                for i, x in enumerate(a)
            )

        return jax.lax.fori_loop(0, iters, body, args)

    out = loop(args)  # compile + warm
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        reps.append((time.perf_counter() - t0) / iters * 1e3)
    return min(reps)


def main():
    global B
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--rank", type=float, default=0.1)
    p.add_argument("--batch", type=int, default=B)
    args = p.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from neuraloperator_tpu.ops.contractions import (
        contract_dense,
        contract_tucker,
    )
    from neuraloperator_tpu.ops.contractions import set_contraction_backend
    from neuraloperator_tpu.tensor.factorized import (
        init_factors,
        resolve_spec,
        to_tensor,
    )
    from neuraloperator_tpu.training import setup

    setup()
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.randn(B, CIN, M1, M2), jnp.float32)
    xi = jnp.asarray(rng.randn(B, CIN, M1, M2), jnp.float32)

    spec = resolve_spec("tucker", (CIN, COUT, M1, M2), args.rank, None)

    # create factors and reconstruct the dense weight INSIDE jit: eager
    # complex arrays abort on restricted TPU runtimes (CLAUDE.md pattern 1)
    @jax.jit
    def make_params(key):
        p = init_factors(key, spec, 0.02)
        return {k: (jnp.real(v), jnp.imag(v)) for k, v in p.items()}

    params = jax.device_get(make_params(jax.random.PRNGKey(0)))
    params = {k: tuple(jnp.asarray(x) for x in v) for k, v in params.items()}
    core_shape = params["core"][0].shape
    n_fact_params = sum(
        int(np.prod(v[0].shape)) for v in params.values()
    )
    print(
        f"tucker rank={args.rank}: core {core_shape}, "
        f"{n_fact_params/1e6:.2f}M complex params "
        f"(dense {CIN*COUT*M1*M2/1e6:.2f}M)",
        flush=True,
    )

    @jax.jit
    def make_dense(p):
        w = to_tensor(
            spec, {k: jax.lax.complex(*v) for k, v in p.items()}
        )
        return jnp.real(w), jnp.imag(w)

    wr, wi = make_dense(params)

    results = {}

    # ---- dense, Pallas kernel (the production TPU hot path) ----
    on_tpu = jax.default_backend() == "tpu"

    def dense_fwdbwd(xr, xi, wr, wi):
        def f(xr, xi, wr, wi):
            o = contract_dense(
                (xr, xi), (wr, wi), return_parts=True,
                compute_dtype=jnp.bfloat16,
            )
            return sum(jnp.sum(t * t) for t in o)

        g = jax.grad(f, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
        return g

    if on_tpu:
        set_contraction_backend("pallas")
        results["dense_pallas"] = timed(
            dense_fwdbwd, xr, xi, wr, wi, iters=args.iters
        )

    # ---- dense, packed-einsum XLA ----
    set_contraction_backend("xla")
    results["dense_xla"] = timed(
        dense_fwdbwd, xr, xi, wr, wi, iters=args.iters
    )
    set_contraction_backend("auto")

    # ---- tucker factorized (complex_einsum chain) ----
    flat_names = sorted(params.keys())
    flat_vals = []
    for k in flat_names:
        v = params[k]
        flat_vals.extend(v if isinstance(v, tuple) else (v,))

    def rebuild(vals):
        out, i = {}, 0
        for k in flat_names:
            out[k] = (vals[i], vals[i + 1])
            i += 2
        return out

    def tucker_fwdbwd(xr, xi, *vals):
        def f(xr, xi, *vals):
            o = contract_tucker(
                (xr, xi), rebuild(vals), spec, return_parts=True,
                compute_dtype=jnp.bfloat16,
            )
            return sum(jnp.sum(t * t) for t in o)

        return jax.grad(f, argnums=tuple(range(2 + len(vals))))(
            xr, xi, *vals
        )

    results["tucker_factorized"] = timed(
        tucker_fwdbwd, xr, xi, *flat_vals, iters=args.iters
    )

    # ---- tucker reconstructed (rebuild dense weight, Pallas contract) ----
    def tucker_recon_fwdbwd(xr, xi, *vals):
        def f(xr, xi, *vals):
            p = {k: jax.lax.complex(*v) for k, v in rebuild(vals).items()}
            w = to_tensor(spec, p)
            o = contract_dense(
                (xr, xi), (jnp.real(w), jnp.imag(w)), return_parts=True,
                compute_dtype=jnp.bfloat16,
            )
            return sum(jnp.sum(t * t) for t in o)

        return jax.grad(f, argnums=tuple(range(2 + len(vals))))(
            xr, xi, *vals
        )

    results["tucker_reconstructed"] = timed(
        tucker_recon_fwdbwd, xr, xi, *flat_vals, iters=args.iters
    )

    # analytic MACs. Key asymmetry: the mode axes (m1, m2) are ELEMENTWISE
    # in the contraction output, so no chain can compress them — the
    # core x U1 x U2 semi-reconstruction costs O(r_i r_o r_1 m1 m2) MACs
    # *independent of batch*, while the dense contraction is O(b i o m1 m2).
    # At the bench batch of 8 the factorized path is therefore MORE FLOPs
    # than dense; it crosses over only at batch >~ r_i r_o / (i o) * ...
    # (see --batch 64). TFNO's advantage is parameters/HBM, not step FLOPs.
    dense_fwd = 4 * 2 * B * CIN * COUT * M1 * M2
    ri, ro, r1, r2 = core_shape
    semi_recon = ri * ro * r1 * r2 * M1 + ri * ro * M1 * M2 * r2
    per_mode = B * ri * ro * M1 * M2
    chan = B * M1 * M2 * (CIN * ri + COUT * ro)
    fact_fwd = 4 * 2 * (semi_recon + per_mode + chan)
    print(
        f"\nanalytic fwd MACs (complex): dense {dense_fwd/8/1e6:.0f}M, "
        f"factorized {fact_fwd/8/1e6:.0f}M "
        f"(semi-reconstruction {4*2*semi_recon/8/1e6:.0f}M, batch-independent)"
    )
    print("results (fwd+bwd, ms):")
    for k, v in results.items():
        tflops = 3 * dense_fwd / (v / 1e3) / 1e12
        extra = f"  [{tflops:.2f} eff-TFLOPS vs dense FLOP count]"
        print(f"  {k:22s} {v:8.3f} ms{extra}")
    base = results.get("dense_pallas", results["dense_xla"])
    print(
        "\nspeedup factorized vs best dense: "
        f"{base / results['tucker_factorized']:.2f}x"
    )


if __name__ == "__main__":
    main()
