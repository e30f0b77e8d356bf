"""Component-level latency breakdown of the NS-128 bench step on TPU.

Times each piece of the train step in isolation (fori_loop-chained inside
one program, transfer-barriered) so the optimization target is visible:

  - rfft2 + irfft2 (the FFT pair, 64 channels @ 128^2)
  - the mode contraction alone (pallas vs xla, bf16)
  - lifting/projection-sized channel MLP einsum
  - H1 training loss
  - the full train step, and the step minus the loss (loss overhead)

Run on the real chip: ``python scripts/bench_components.py``.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, C, RES, MODES = 8, 64, 128, 64
ITERS = 40


def timed(name, chain_fn, *args):
    out = chain_fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = chain_fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(json.dumps({"component": name, "ms_per_iter": round(ms, 4)}),
          flush=True)
    return ms


def main():
    from neuraloperator_tpu.training import setup

    setup(matmul_precision="tensorfloat32")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, RES, RES), jnp.float32)

    # --- FFT pair ---
    @jax.jit
    def fft_chain(x):
        def body(_, cur):
            xf = jnp.fft.rfftn(cur, axes=(-2, -1), norm="forward")
            return jnp.fft.irfftn(
                xf, s=(RES, RES), axes=(-2, -1), norm="forward"
            )

        return jax.lax.fori_loop(0, ITERS, body, x)

    timed("rfft2+irfft2 (8,64,128,128)", fft_chain, x)

    # --- contraction alone (fwd) ---
    from neuraloperator_tpu.ops import contractions

    m1, m2 = MODES, MODES // 2 + 1
    xr = jnp.asarray(rng.randn(B, C, m1, m2), jnp.bfloat16)
    xi = jnp.asarray(rng.randn(B, C, m1, m2), jnp.bfloat16)
    wr = jnp.asarray(rng.randn(C, C, m1, m2), jnp.bfloat16)
    wi = jnp.asarray(rng.randn(C, C, m1, m2), jnp.bfloat16)

    for backend in ("pallas", "xla"):
        contractions.set_contraction_backend(backend)

        @jax.jit
        def contract_chain(xr, xi, wr, wi):
            def body(_, cur):
                o_r, o_i = contractions.contract_dense(
                    (cur[0], cur[1]), (wr, wi), return_parts=True
                )
                s = jnp.bfloat16(0.01)
                return (o_r.astype(jnp.bfloat16) * s,
                        o_i.astype(jnp.bfloat16) * s)

            return jax.lax.fori_loop(0, ITERS, body, (xr, xi))

        timed(f"contraction fwd bf16 [{backend}]", contract_chain,
              xr, xi, wr, wi)
        contractions.set_contraction_backend("auto")

    # --- channel-MLP-sized einsum (projection 64->256->1 fwd) ---
    h = jnp.asarray(rng.randn(B, C, RES * RES), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(256, C), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(C, 256), jnp.bfloat16)

    @jax.jit
    def mlp_chain(h):
        def body(_, cur):
            z = jnp.einsum("oc,bcs->bos", w1, cur,
                           preferred_element_type=jnp.float32)
            z = jax.nn.gelu(z).astype(jnp.bfloat16)
            return jnp.einsum("oc,bcs->bos", w2, z,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16) * jnp.bfloat16(0.01)

        return jax.lax.fori_loop(0, ITERS, body, h)

    timed("channel MLP 64->256->64 @128^2 fwd", mlp_chain, h)

    # --- H1 loss ---
    from neuraloperator_tpu.losses import H1Loss

    h1 = H1Loss(d=2)
    y = jnp.asarray(rng.randn(B, 1, RES, RES), jnp.float32)
    u = jnp.asarray(rng.randn(B, 1, RES, RES), jnp.float32)

    @jax.jit
    def loss_chain(u, y):
        def body(_, acc):
            return acc + h1(u + acc * 1e-9, y)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timed("H1 loss fwd (8,1,128,128)", loss_chain, u, y)

    # --- full step vs fwd-only model ---
    import optax

    from neuraloperator_tpu.models import FNO

    model = FNO(
        n_modes=(MODES, MODES), in_channels=1, out_channels=1,
        hidden_channels=C, n_layers=4, projection_channel_ratio=4,
        weight_dtype="bfloat16", fno_block_precision="mixed",
    )
    xx = jnp.asarray(rng.randn(B, 1, RES, RES), jnp.float32)
    yy = jnp.asarray(rng.randn(B, 1, RES, RES), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xx)["params"]
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    def to_half(a):
        return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a

    @jax.jit
    def fwd_chain(params, xx):
        hp = jax.tree_util.tree_map(to_half, params)

        def body(_, cur):
            out = model.apply({"params": hp}, to_half(cur))
            return 0.9 * cur + 0.1 * out.astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, xx)

    timed("FNO forward only", fwd_chain, params, xx)

    @jax.jit
    def step_chain(params, opt_state, xx, yy):
        def train_step(p, s):
            def loss_fn(q):
                q = jax.tree_util.tree_map(to_half, q)
                out = model.apply({"params": q}, to_half(xx))
                return h1(out.astype(jnp.float32), yy)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        def body(_, carry):
            p, s, _ = carry
            return train_step(p, s)

        return jax.lax.fori_loop(
            0, ITERS, body, (params, opt_state, jnp.float32(0))
        )

    timed("FNO full train step", step_chain, params, opt_state, xx, yy)


if __name__ == "__main__":
    main()
