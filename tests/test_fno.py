"""FNO/TFNO model tests (mirrors reference models/tests/test_fno.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.models import FNO, TFNO, get_model
from neuraloperator_tpu.utils import count_model_params


@pytest.mark.parametrize("n_dim", [1, 2, 3])
def test_fno_forward_backward(n_dim):
    sizes = (12,) * n_dim
    model = FNO(
        n_modes=(6,) * n_dim,
        in_channels=3,
        out_channels=2,
        hidden_channels=8,
        n_layers=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, *sizes))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 2, *sizes)

    # every parameter must receive gradient (reference test_fno.py:79-83)
    grads = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    n_unused = 0
    for leaf in jax.tree_util.tree_leaves(grads):
        if not np.any(np.asarray(leaf) != 0):
            n_unused += 1
    assert n_unused == 0


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(fno_skip="soft-gating", channel_mlp_skip="linear"),
        dict(norm="instance_norm"),
        dict(norm="group_norm"),
        dict(preactivation=True),
        dict(domain_padding=0.25),
        dict(stabilizer="tanh"),
        dict(factorization="cp", rank=0.2),
        dict(separable=True),
        dict(conv_bias_kernel=3),
        dict(positional_embedding=None),
    ],
)
def test_fno_variants(kwargs):
    model = FNO(
        n_modes=(6, 6),
        in_channels=1,
        out_channels=1,
        hidden_channels=8,
        n_layers=2,
        **kwargs,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 1, 12, 12)
    assert np.all(np.isfinite(np.asarray(y)))


def test_super_resolution_output_shape():
    model = FNO(
        n_modes=(6, 6), in_channels=1, out_channels=1, hidden_channels=8, n_layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x, output_shape=(24, 24))
    assert y.shape == (1, 1, 24, 24)


def test_resolution_invariance():
    """Same weights run at any resolution (discretization invariance)."""
    model = FNO(
        n_modes=(6, 6), in_channels=1, out_channels=1, hidden_channels=8, n_layers=2
    )
    x16 = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x16)
    y16 = model.apply(variables, x16)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32))
    y32 = model.apply(variables, x32)
    assert y16.shape[-2:] == (16, 16) and y32.shape[-2:] == (32, 32)


def test_tfno_compression():
    """Tucker rank 0.1 gives ~10% of dense Fourier-weight params
    (reference README claim; models/fno.py:461-466)."""
    dense = FNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=32,
        n_layers=4,
    )
    tucker = TFNO(
        n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=32,
        n_layers=4,
    )
    x = jnp.zeros((1, 1, 32, 32))
    nd = count_model_params(dense.init(jax.random.PRNGKey(0), x)["params"])
    nt = count_model_params(tucker.init(jax.random.PRNGKey(0), x)["params"])
    assert nt < 0.35 * nd  # fourier weights dominate; compressed model is small


def test_get_model_registry():
    config = {
        "model": {
            "model_arch": "fno",
            "n_modes": [6, 6],
            "in_channels": 1,
            "out_channels": 1,
            "hidden_channels": 8,
            "n_layers": 2,
        }
    }
    model = get_model(config)
    x = jnp.zeros((1, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 12, 12)


def test_jit_forward():
    model = FNO(
        n_modes=(6, 6), in_channels=1, out_channels=1, hidden_channels=8, n_layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
    variables = model.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))
    y1 = fwd(variables["params"], x)
    y2 = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=1e-6)


def test_remat_matches_plain_outputs_and_grads():
    """remat=True recomputes activations; numerics identical."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
    plain = FNO(n_modes=(6, 6), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=2)
    remat = FNO(n_modes=(6, 6), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=2, remat=True)
    params = plain.init(jax.random.PRNGKey(1), x)["params"]

    out_p = plain.apply({"params": params}, x)
    out_r = remat.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x) ** 2)
        return f

    g_p = jax.jit(jax.grad(loss(plain)))(params)
    g_r = jax.jit(jax.grad(loss(remat)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_scan_layers_runs():
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
    model = FNO(n_modes=(6, 6), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=3, scan_layers=True, remat=True)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    g = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x) ** 2)
    )(params)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(g)
    )
