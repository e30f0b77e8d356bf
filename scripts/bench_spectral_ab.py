"""A/B microbench on the real TPU: spectral-contraction backends.

Measures, on the NS-128 bench hot shape (batch 8, 64 channels, 64x64 modes
-> kept (64, 33) rfft block):

  1. packed-XLA einsum contraction, f32 operands
  2. packed-XLA einsum contraction, bf16 operands (f32 accumulation)
  3. Pallas Karatsuba mode-tiled kernel, f32
  4. Pallas Karatsuba mode-tiled kernel, bf16

and the full SpectralConv fwd+bwd latency at 64^2 modes (the second
BASELINE.json metric) for f32 vs mixed precision.

Timing protocol: the relayed TPU runtime's block_until_ready does not wait
for device compute, so every timed region chains its iterations on data
dependencies and ends with a host transfer.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn, args, n_iters, feedback):
    """Run fn n_iters times, chaining via ``feedback(out, args) -> args``."""
    out = fn(*args)  # warmup/compile
    jax.tree_util.tree_map(
        lambda a: float(np.asarray(a).ravel()[0]), out
    )
    t0 = time.perf_counter()
    cur = args
    for _ in range(n_iters):
        out = fn(*cur)
        cur = feedback(out, cur)
    jax.tree_util.tree_map(lambda a: float(np.asarray(a).ravel()[0]), out)
    dt = time.perf_counter() - t0
    return dt / n_iters


def bench_contraction(backend: str, dtype, n_iters: int = 100):
    from neuraloperator_tpu.ops import contractions

    M, B, I, O = 64 * 33, 8, 64, 64
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.randn(B, I, 64, 33), dtype)
    xi = jnp.asarray(rng.randn(B, I, 64, 33), dtype)
    wr = jnp.asarray(rng.randn(I, O, 64, 33), dtype)
    wi = jnp.asarray(rng.randn(I, O, 64, 33), dtype)

    contractions.set_contraction_backend(backend)

    @jax.jit
    def f(xr, xi, wr, wi):
        o_r, o_i = contractions.contract_dense(
            (xr, xi), (wr, wi), return_parts=True
        )
        return o_r, o_i

    def feedback(out, cur):
        # chain: scale outputs down to avoid overflow, reuse as inputs
        o_r, o_i = out
        s = dtype(0.01) if dtype != jnp.float32 else 0.01
        return (
            (o_r * s).astype(dtype),
            (o_i * s).astype(dtype),
            cur[2],
            cur[3],
        )

    sec = timed_chain(f, (xr, xi, wr, wi), n_iters, feedback)
    contractions.set_contraction_backend("auto")
    # useful MACs of the complex contraction (4 real products equivalent)
    flops = 2 * 4 * M * B * I * O
    return {
        "case": f"contract_{backend}_{np.dtype(dtype).name}",
        "ms": round(sec * 1e3, 4),
        "tflops_effective": round(flops / sec / 1e12, 3),
    }


def check_pallas_numerics():
    """Pallas vs XLA contraction on-device closeness at the bench shape."""
    from neuraloperator_tpu.ops import contractions

    rng = np.random.RandomState(1)
    x = (
        jnp.asarray(rng.randn(2, 16, 16, 9), jnp.float32),
        jnp.asarray(rng.randn(2, 16, 16, 9), jnp.float32),
    )
    w = (
        jnp.asarray(rng.randn(16, 16, 16, 9), jnp.float32),
        jnp.asarray(rng.randn(16, 16, 16, 9), jnp.float32),
    )

    def run(backend):
        contractions.set_contraction_backend(backend)

        @jax.jit
        def f(xr, xi, wr, wi):
            return contractions.contract_dense(
                (xr, xi), (wr, wi), return_parts=True
            )

        out = f(x[0], x[1], w[0], w[1])
        contractions.set_contraction_backend("auto")
        return np.asarray(out[0]), np.asarray(out[1])

    ar, ai = run("xla")
    br, bi = run("pallas")
    err = max(np.abs(ar - br).max(), np.abs(ai - bi).max())
    scale = max(np.abs(ar).max(), 1e-30)
    return {"case": "pallas_vs_xla_maxrel", "value": float(err / scale)}


def bench_spectral_conv(precision: str, n_iters: int = 50):
    """Full SpectralConv fwd+bwd latency at 64^2 modes, res 128."""
    from neuraloperator_tpu.layers.spectral_convolution import SpectralConv

    conv = SpectralConv(
        in_channels=64,
        out_channels=64,
        n_modes=(64, 64),
        fno_block_precision=precision,
    )
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 64, 128, 128), jnp.float32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd_bwd(params, x):
        def loss(p, xx):
            return jnp.sum(conv.apply(p, xx) ** 2)

        val, grad = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        return val, grad[1]

    def feedback(out, cur):
        val, gx = out
        return (cur[0], 0.5 * cur[1] + 1e-3 * gx)

    sec = timed_chain(fwd_bwd, (params, x), n_iters, feedback)
    return {
        "case": f"spectral_conv_fwdbwd_64modes_{precision}",
        "ms": round(sec * 1e3, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--cases",
        default="numerics,xla_f32,xla_bf16,pallas_f32,pallas_bf16,conv_full,conv_mixed",
    )
    args = p.parse_args()
    cases = set(args.cases.split(","))

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    results = []
    if "numerics" in cases:
        results.append(check_pallas_numerics())
        print(json.dumps(results[-1]), flush=True)
    if "xla_f32" in cases:
        results.append(bench_contraction("xla", jnp.float32))
        print(json.dumps(results[-1]), flush=True)
    if "xla_bf16" in cases:
        results.append(bench_contraction("xla", jnp.bfloat16))
        print(json.dumps(results[-1]), flush=True)
    if "pallas_f32" in cases:
        results.append(bench_contraction("pallas", jnp.float32))
        print(json.dumps(results[-1]), flush=True)
    if "pallas_bf16" in cases:
        results.append(bench_contraction("pallas", jnp.bfloat16))
        print(json.dumps(results[-1]), flush=True)
    if "conv_full" in cases:
        results.append(bench_spectral_conv("full"))
        print(json.dumps(results[-1]), flush=True)
    if "conv_mixed" in cases:
        results.append(bench_spectral_conv("mixed"))
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
