"""CODANO vs FNO on a task codomain attention is DESIGNED for
(multi-variable, permutation-equivariant coupled operator) — the fair
fight the single-variable Darcy rows cannot provide (BASELINE.md
round-4: collapsed to one variable, CODANO degenerates to a small FNO
with attention overhead).

Task: n_vars coupled fields on a 2-D torus with IDENTICAL per-variable
physics and symmetric coupling,

    m   = mean_j x_j
    y_i = A x_i + B m + 0.5 * LP( (P x_i) * (P m) )

with A, B random band-limited spectral multipliers and P/LP low-pass
projections (all fixed across variables and seeds) — exactly
permutation-equivariant over the variable set, nonlinear through the
quadratic coupling. CODANO's variable-tokenized codomain attention
(reference ``/root/reference/neuralop/models/codano.py:406-430``)
matches this symmetry by construction and can EXTEND a trained model to
more variables (``extend_variable_ids``, reference :351-372); a plain
FNO must relearn dense channel mixing from scratch and cannot even load
2-variable weights for a 3-variable system.

Arms (all seeded, serial):
  codano_pre        train 2-var (u,v) PRETRAIN_EPOCHS, extend to w,
                    fine-tune FT_EPOCHS on 3-var, eval 3-var
  codano_scratch_ft 3-var from scratch at the fine-tune budget
  fno_ft            3-var param-matched FNO at the fine-tune budget
  codano_scratch    3-var from scratch at the full budget
  fno_full          3-var param-matched FNO at the full budget

Every epoch runs as ONE jitted lax.scan program over the on-device
dataset (the relay's ~25 ms/dispatch would otherwise dominate these
small steps). Results append to artifacts/results.jsonl.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.models import CODANO, FNO, extend_variable_ids
from neuraloperator_tpu.training.optimizer import adamw
from neuraloperator_tpu.utils import count_model_params

RES = 32
VAR_IDS = ("u", "v", "w")


# --------------------------------------------------------------------- #
# data: fixed random band-limited operators, identical per variable
def _spectral_multiplier(rng, res, kmax):
    kx = np.fft.fftfreq(res)[:, None] * res
    ky = np.fft.rfftfreq(res)[None, :] * res
    band = (np.abs(kx) <= kmax) & (ky <= kmax)
    mult = rng.randn(res, res // 2 + 1) * band
    return mult.astype(np.float64)


def make_dataset(n, n_vars, seed, ops_seed=123):
    """(x, y) with the permutation-equivariant coupled operator."""
    opr = np.random.RandomState(ops_seed)  # SAME operators for all splits
    A = _spectral_multiplier(opr, RES, kmax=8)
    B = _spectral_multiplier(opr, RES, kmax=8)
    kx = np.fft.fftfreq(RES)[:, None] * RES
    ky = np.fft.rfftfreq(RES)[None, :] * RES
    P = ((np.abs(kx) <= 4) & (ky <= 4)).astype(np.float64)
    LP = ((np.abs(kx) <= 8) & (ky <= 8)).astype(np.float64)

    r = np.random.RandomState(seed)
    # band-limited random input fields (|k| <= 8)
    xh = (r.randn(n, n_vars, RES, RES // 2 + 1)
          + 1j * r.randn(n, n_vars, RES, RES // 2 + 1)) * LP
    x = np.fft.irfft2(xh, s=(RES, RES))
    x /= x.std()

    xh = np.fft.rfft2(x)
    mh = xh.mean(axis=1, keepdims=True)
    lin = np.fft.irfft2(A * xh + B * mh, s=(RES, RES))
    px = np.fft.irfft2(P * xh, s=(RES, RES))
    pm = np.fft.irfft2(P * mh, s=(RES, RES))
    quad = np.fft.irfft2(LP * np.fft.rfft2(px * pm), s=(RES, RES))
    y = lin + 0.5 * quad
    return x.astype(np.float32), y.astype(np.float32)


# --------------------------------------------------------------------- #
def rel_l2(out, y):
    """Mean per-sample relative L2 over all variables."""
    num = jnp.sqrt(jnp.sum((out - y) ** 2, axis=(1, 2, 3)))
    den = jnp.sqrt(jnp.sum(y ** 2, axis=(1, 2, 3))) + 1e-8
    return jnp.mean(num / den)


def train_arm(apply_fn, params, xtr, ytr, xte, yte, epochs, lr, batch,
              seed=0, log_every=25, label=""):
    """Epoch-scan training: one jitted program per epoch shape."""
    opt = adamw(lr, weight_decay=1e-4)
    opt_state = opt.init(params)
    n = xtr.shape[0]
    steps = n // batch
    xtr, ytr = jnp.asarray(xtr), jnp.asarray(ytr)
    xte, yte = jnp.asarray(xte), jnp.asarray(yte)

    def step(carry, idx):
        params, opt_state = carry

        def loss_fn(p):
            return rel_l2(apply_fn(p, xtr[idx]), ytr[idx])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax

        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def epoch(params, opt_state, key):
        perm = jax.random.permutation(key, n)[: steps * batch]
        idxs = perm.reshape(steps, batch)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idxs
        )
        return params, opt_state, jnp.mean(losses)

    eval_fn = jax.jit(lambda p: rel_l2(apply_fn(p, xte), yte))
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for e in range(epochs):
        params, opt_state, tr = epoch(
            params, opt_state, jax.random.fold_in(key, e)
        )
        if e % log_every == 0 or e == epochs - 1:
            print(f"  [{label}] ep {e}: train {float(tr):.4f} "
                  f"test {float(eval_fn(params)):.4f}", flush=True)
    return params, float(eval_fn(params)), time.time() - t0


def build_codano(variable_ids, cfg):
    return CODANO(
        n_modes=((cfg.n_modes, cfg.n_modes),) * cfg.n_layers,
        n_layers=cfg.n_layers,
        hidden_variable_codimension=cfg.hidden_variable_codimension,
        lifting_channels=cfg.lifting_channels,
        projection_channels=cfg.projection_channels,
        use_positional_encoding=True,
        positional_encoding_dim=cfg.positional_encoding_dim,
        variable_ids=tuple(variable_ids),
        per_channel_attention=False,
        attention_token_dim=cfg.attention_token_dim,
        domain_padding=None,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=512)
    ap.add_argument("--n_test", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pretrain_epochs", type=int, default=150)
    ap.add_argument("--ft_epochs", type=int, default=30)
    ap.add_argument("--full_epochs", type=int, default=150)
    ap.add_argument("--learning_rate", type=float, default=2e-3)
    ap.add_argument("--ft_learning_rate", type=float, default=1e-3)
    ap.add_argument("--n_modes", type=int, default=8)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--hidden_variable_codimension", type=int, default=16)
    ap.add_argument("--lifting_channels", type=int, default=32)
    ap.add_argument("--projection_channels", type=int, default=32)
    ap.add_argument("--positional_encoding_dim", type=int, default=4)
    ap.add_argument("--attention_token_dim", type=int, default=8)
    ap.add_argument("--no_results", action="store_true",
                    help="skip appending to artifacts/results.jsonl")
    cfg = ap.parse_args()
    cfg.results = not cfg.no_results
    rows = {}

    x2tr, y2tr = make_dataset(cfg.n_train, 2, seed=10)
    x3tr, y3tr = make_dataset(cfg.n_train, 3, seed=11)
    x3te, y3te = make_dataset(cfg.n_test, 3, seed=12)

    # ---- CODANO pretrain on (u, v), extend, fine-tune on (u, v, w) ----
    cod2 = build_codano(VAR_IDS[:2], cfg)
    p2 = jax.jit(
        lambda k, xx: cod2.init(k, xx, input_variable_ids=list(VAR_IDS[:2]))
    )(jax.random.PRNGKey(0), jnp.asarray(x2tr[:2]))["params"]
    n_cod = count_model_params(p2)
    print(f"CODANO params (2-var): {n_cod}")

    apply2 = lambda p, xx: cod2.apply(  # noqa: E731
        {"params": p}, xx, input_variable_ids=list(VAR_IDS[:2])
    )
    p2, pre_test2, t_pre = train_arm(
        apply2, p2, x2tr, y2tr, *make_dataset(cfg.n_test, 2, seed=13),
        cfg.pretrain_epochs, cfg.learning_rate, cfg.batch,
        label="codano 2-var pretrain",
    )
    rows["codano_pretrain_2var"] = {"test_l2_2var": pre_test2,
                                    "wall_s": round(t_pre, 1)}

    cod3, p3 = extend_variable_ids(cod2, p2, ["w"], jax.random.PRNGKey(1))
    apply3 = lambda p, xx: cod3.apply(  # noqa: E731
        {"params": p}, xx, input_variable_ids=list(VAR_IDS)
    )
    # zero-shot: pretrained physics + fresh pos-enc for w
    zs = float(jax.jit(lambda p: rel_l2(apply3(p, jnp.asarray(x3te)),
                                        jnp.asarray(y3te)))(p3))
    print(f"CODANO extended zero-shot 3-var test l2: {zs:.4f}")

    p3, ft_test, t_ft = train_arm(
        apply3, p3, x3tr, y3tr, x3te, y3te,
        cfg.ft_epochs, cfg.ft_learning_rate, cfg.batch,
        label="codano extend+finetune",
    )
    rows["codano_pre_extend_ft"] = {
        "zero_shot_l2": round(zs, 4), "test_l2": ft_test,
        "epochs": cfg.ft_epochs, "wall_s": round(t_ft, 1),
        "n_params": int(count_model_params(p3)),
    }

    # ---- CODANO from scratch on 3-var ----
    cod3s = build_codano(VAR_IDS, cfg)
    ps = jax.jit(
        lambda k, xx: cod3s.init(k, xx, input_variable_ids=list(VAR_IDS))
    )(jax.random.PRNGKey(2), jnp.asarray(x3tr[:2]))["params"]
    apply3s = lambda p, xx: cod3s.apply(  # noqa: E731
        {"params": p}, xx, input_variable_ids=list(VAR_IDS)
    )
    ps_ft, sc_ft, t1 = train_arm(
        apply3s, ps, x3tr, y3tr, x3te, y3te,
        cfg.ft_epochs, cfg.learning_rate, cfg.batch,
        label="codano scratch@ft-budget",
    )
    rows["codano_scratch_ft_budget"] = {
        "test_l2": sc_ft, "epochs": cfg.ft_epochs, "wall_s": round(t1, 1)
    }
    ps_full, sc_full, t2 = train_arm(
        apply3s, ps, x3tr, y3tr, x3te, y3te,
        cfg.full_epochs, cfg.learning_rate, cfg.batch,
        label="codano scratch@full",
    )
    rows["codano_scratch_full"] = {
        "test_l2": sc_full, "epochs": cfg.full_epochs,
        "wall_s": round(t2, 1),
        "n_params": int(count_model_params(ps_full)),
    }

    # ---- param-matched FNO on 3-var ----
    n_target = int(count_model_params(ps))
    best = None
    for hidden in range(8, 65, 2):
        f = FNO(n_modes=(cfg.n_modes, cfg.n_modes), in_channels=3,
                out_channels=3, hidden_channels=hidden, n_layers=cfg.n_layers)
        pf = jax.eval_shape(
            lambda k, xx, f=f: f.init(k, xx),
            jax.random.PRNGKey(3), jnp.zeros((2, 3, RES, RES), jnp.float32),
        )["params"]
        cnt = sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(pf)
        )
        if best is None or abs(cnt - n_target) < abs(best[1] - n_target):
            best = (hidden, cnt)
    hidden, n_fno = best
    print(f"param-matched FNO: hidden={hidden} ({n_fno} params "
          f"vs CODANO {n_target})")
    fno = FNO(n_modes=(cfg.n_modes, cfg.n_modes), in_channels=3,
              out_channels=3, hidden_channels=hidden, n_layers=cfg.n_layers)
    pf = jax.jit(fno.init)(
        jax.random.PRNGKey(3), jnp.asarray(x3tr[:2])
    )["params"]
    applyf = lambda p, xx: fno.apply({"params": p}, xx)  # noqa: E731
    _, fno_ft, t3 = train_arm(
        applyf, pf, x3tr, y3tr, x3te, y3te,
        cfg.ft_epochs, cfg.learning_rate, cfg.batch, label="fno@ft-budget",
    )
    rows["fno_ft_budget"] = {"test_l2": fno_ft, "epochs": cfg.ft_epochs,
                             "wall_s": round(t3, 1), "n_params": n_fno}
    _, fno_full, t4 = train_arm(
        applyf, pf, x3tr, y3tr, x3te, y3te,
        cfg.full_epochs, cfg.learning_rate, cfg.batch, label="fno@full",
    )
    rows["fno_full"] = {"test_l2": fno_full, "epochs": cfg.full_epochs,
                        "wall_s": round(t4, 1), "n_params": n_fno}

    result = {
        "run": "codano_multivar_fair_fight",
        "task": "3-var permutation-equivariant coupled operator, res 32",
        "n_train": cfg.n_train, "n_test": cfg.n_test,
        "arms": rows,
    }
    print(json.dumps(result))
    if cfg.results:
        out = Path(__file__).resolve().parents[1] / "artifacts" / (
            "results.jsonl"
        )
        with out.open("a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
