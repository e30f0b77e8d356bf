"""Extending a trained CODANO to unseen PDE variables.

CODANO tokenizes each physical variable as a function and learns a
Fourier-space positional encoding per variable id, so one model can train
across PDE systems with different variable sets (multi-physics
pretraining). This example trains a small CODANO on a two-variable system,
then extends it to a third, previously unseen variable with
``extend_variable_ids`` — the functional counterpart of the reference's
in-place ``_extend_positional_encoding``
(``/root/reference/neuralop/models/codano.py:351-372``) — and fine-tunes
only briefly: the pretrained attention/lifting weights transfer, only the
new encoding starts fresh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuraloperator_tpu.models import CODANO, extend_variable_ids

rng = np.random.RandomState(0)
res = 16


def make_system(n, n_vars, seed):
    """Toy coupled system: targets are smoothed mixtures of the inputs."""
    r = np.random.RandomState(seed)
    x = r.randn(n, n_vars, res, res).astype(np.float32)
    k = np.fft.rfftfreq(res) * res
    kx = np.fft.fftfreq(res)[:, None] * res
    lowpass = (np.abs(kx) <= 4) & (k[None, :] <= 4)
    mix = np.roll(x, 1, axis=1) - 0.5 * x
    y = np.fft.irfft2(np.fft.rfft2(mix) * lowpass, s=(res, res))
    return x, y.astype(np.float32)


model = CODANO(
    n_modes=((8, 8),) * 2,
    n_layers=2,
    hidden_variable_codimension=8,
    lifting_channels=16,
    projection_channels=16,
    use_positional_encoding=True,
    positional_encoding_dim=4,
    variable_ids=("u", "v"),
    per_channel_attention=False,
    attention_token_dim=4,
    domain_padding=None,
)

x2, y2 = make_system(64, 2, seed=1)
params = model.init(
    jax.random.PRNGKey(0), jnp.asarray(x2[:2]), input_variable_ids=["u", "v"]
)["params"]

opt = optax.adam(2e-3)


def fit(model, params, x, y, var_ids, steps, opt_state=None):
    opt_state = opt.init(params) if opt_state is None else opt_state

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, xb, input_variable_ids=var_ids
            )
            return jnp.mean((out - yb) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    xb, yb = jnp.asarray(x), jnp.asarray(y)
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, xb, yb)
        if i % max(steps // 4, 1) == 0:
            print(f"  step {i}: mse {float(loss):.4f}")
    return params, float(loss)


print("pretraining on variables (u, v):")
params, pre_loss = fit(model, params, x2, y2, ["u", "v"], steps=60)

# ---- extend the trained model to a third variable 'w' ----
ext_model, ext_params = extend_variable_ids(
    model, params, ["w"], jax.random.PRNGKey(1)
)
print(f"extended variable set: {ext_model.variable_ids}")

# outputs for the original variables are bit-identical after extension
before = model.apply(
    {"params": params}, jnp.asarray(x2[:4]), input_variable_ids=["u", "v"]
)
after = ext_model.apply(
    {"params": ext_params}, jnp.asarray(x2[:4]),
    input_variable_ids=["u", "v"],
)
assert np.array_equal(np.asarray(before), np.asarray(after))
print("old-variable outputs unchanged: OK")

# brief fine-tune on the three-variable system: pretrained weights
# transfer, only pos_enc_w is new
x3, y3 = make_system(64, 3, seed=2)
print("fine-tuning on (u, v, w):")
_, ft_loss = fit(ext_model, ext_params, x3, y3, ["u", "v", "w"], steps=30)

# a from-scratch three-variable model at the same budget, for contrast
scratch = CODANO(
    n_modes=((8, 8),) * 2, n_layers=2, hidden_variable_codimension=8,
    lifting_channels=16, projection_channels=16,
    use_positional_encoding=True, positional_encoding_dim=4,
    variable_ids=("u", "v", "w"), per_channel_attention=False,
    attention_token_dim=4, domain_padding=None,
)
sp = scratch.init(
    jax.random.PRNGKey(2), jnp.asarray(x3[:2]),
    input_variable_ids=["u", "v", "w"],
)["params"]
print("from scratch at the same fine-tune budget:")
_, scratch_loss = fit(scratch, sp, x3, y3, ["u", "v", "w"], steps=30)

print(
    f"\nfine-tuned-from-pretrained mse {ft_loss:.4f} vs "
    f"from-scratch mse {scratch_loss:.4f}"
)
