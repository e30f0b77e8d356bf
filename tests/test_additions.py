"""Coverage for later additions: DISCO bases, OT car data, plateau LR,
presets, the_well processor, point-cloud FD, FC-extended FourierDiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.discrete_continuous_convolution import (
    EquidistantDiscreteContinuousConv2d,
    equidistant_filter_basis,
    num_basis_functions,
)


@pytest.mark.parametrize("basis,ks", [("morlet", (2, 4)), ("zernike", (3,))])
def test_disco_extra_bases(basis, ks):
    psi = equidistant_filter_basis(ks, 5, basis)
    assert psi.shape[0] == num_basis_functions(ks, basis)
    conv = EquidistantDiscreteContinuousConv2d(
        in_channels=2, out_channels=3, kernel_shape=ks, kernel_size=5,
        basis_type=basis,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, 12))
    v = conv.init(jax.random.PRNGKey(1), x)
    assert conv.apply(v, x).shape == (1, 3, 12, 12)


def test_car_ot_dataset_and_processor():
    from neuraloperator_tpu.data.datasets import CarOTDataset, CFDDataProcessor
    from neuraloperator_tpu.data.datasets.darcy import _find_root

    if _find_root() is None:
        pytest.skip("no shipped data")
    try:
        ds = CarOTDataset()
    except FileNotFoundError:
        pytest.skip("no ot archive")
    sample = CFDDataProcessor().preprocess(ds.train_data[0])
    n = sample["x"].shape[-1]
    assert sample["x"].shape == (1, 6, n, n)
    assert sample["y"].shape[1] == sample["ind_dec"].shape[0]


def test_reduce_on_plateau_trainer():
    from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
    from neuraloperator_tpu.losses import LpLoss
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.training import Trainer, adamw, reduce_on_plateau

    rng = np.random.RandomState(0)
    x = rng.randn(16, 1, 8, 8).astype(np.float32)
    ds = TensorDataset(x, 2 * x)
    model = FNO(
        n_modes=(4, 4), in_channels=1, out_channels=1, hidden_channels=8,
        n_layers=1,
    )
    trainer = Trainer(model=model, n_epochs=2)
    metrics = trainer.train(
        DataLoader(ds, 8),
        {"t": DataLoader(ds, 8)},
        reduce_on_plateau(adamw(1e-3), patience=2),
        training_loss=LpLoss(d=2),
        eval_losses={"l2": LpLoss(d=2)},
    )
    assert np.isfinite(metrics["train_err"])


def test_model_presets():
    from neuraloperator_tpu.config import FNO_Small2d, TFNO_Medium2d
    from neuraloperator_tpu.models import get_model

    m = get_model({"model": FNO_Small2d().to_dict()})
    assert m.hidden_channels == 24
    t = get_model({"model": TFNO_Medium2d().to_dict()})
    assert t.factorization == "tucker" and t.rank == 0.1


def test_the_well_processor_rollout():
    from neuraloperator_tpu.data.transforms import TheWellDataProcessor

    dp = TheWellDataProcessor()
    x0 = jnp.ones((2, 1, 4, 4))
    s = dp.preprocess({"x": x0, "y": None}, train=False, step=0)
    np.testing.assert_array_equal(np.asarray(s["x"]), np.asarray(x0))
    out, _ = dp.postprocess(x0 * 2, s, train=False)
    s1 = dp.preprocess({"x": x0, "y": None}, train=False, step=1)
    np.testing.assert_array_equal(np.asarray(s1["x"]), np.asarray(x0 * 2))


def test_non_uniform_fd_linear_field():
    from neuraloperator_tpu.losses import non_uniform_fd

    rng = np.random.RandomState(0)
    pts = rng.rand(100, 2).astype(np.float32)
    vals = 3 * pts[:, 0] + 2 * pts[:, 1]
    d = np.asarray(
        non_uniform_fd(pts, vals, num_neighbors=8, derivative_indices=(0, 1))
    )
    np.testing.assert_allclose(d[0], 3.0, atol=1e-2)
    np.testing.assert_allclose(d[1], 2.0, atol=1e-2)


def test_fourier_diff_fc_nonperiodic():
    from neuraloperator_tpu.losses import FourierDiff

    n = 128
    xs = np.linspace(0, 1, n)
    f = jnp.asarray(xs ** 2, jnp.float32)[None]
    fd = FourierDiff(dim=1, L=1.0, use_fc=True, fc_degree=4,
                     fc_n_additional_pts=50)
    df = np.asarray(fd.dx(f))[0]
    assert np.abs(df[5:-5] - 2 * xs[5:-5]).max() < 5e-2


def test_partialclass_subclassing():
    from neuraloperator_tpu.models import FNO, partialclass

    M = partialclass("MiniFNO", FNO, hidden_channels=8, n_layers=1)
    m = M(n_modes=(4, 4), in_channels=1, out_channels=1)
    x = jnp.ones((1, 1, 8, 8))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 1, 8, 8)
    assert M.__name__ == "MiniFNO" and issubclass(M, FNO)
    with pytest.raises(TypeError):
        partialclass("Bad", FNO, not_a_field=3)


def test_mg_patched_trainer_end_to_end():
    """Trainer must init params on the *preprocessed* (patched) batch:
    with levels=1 the model input has 2x data channels and 1/2 resolution."""
    from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
    from neuraloperator_tpu.data.transforms import MGPatchingDataProcessor
    from neuraloperator_tpu.losses import LpLoss
    from neuraloperator_tpu.models import get_model
    from neuraloperator_tpu.training import Trainer, adamw

    rng = np.random.RandomState(0)
    x = rng.randn(8, 1, 16, 16).astype(np.float32)
    ds = TensorDataset(x, 2 * x)
    dp = MGPatchingDataProcessor(levels=1, padding_fraction=0.0,
                                 stitching=True)
    config = {
        "model": {
            "arch": "FNO", "n_modes": [4, 4], "in_channels": 1,
            "out_channels": 1, "hidden_channels": 8, "n_layers": 1,
            "data_channels": 1,
        },
        "patching": {"levels": 1},
    }
    model = get_model(config)
    assert model.in_channels == 2  # (levels+1) * data_channels
    trainer = Trainer(model=model, n_epochs=1, data_processor=dp)
    metrics = trainer.train(
        DataLoader(ds, 4), {"t": DataLoader(ds, 4)}, adamw(1e-3),
        training_loss=LpLoss(d=2), eval_losses={"l2": LpLoss(d=2)},
    )
    assert np.isfinite(metrics["train_err"])


class TestScanFNO:
    def _model(self, **kw):
        from neuraloperator_tpu.models import FNO

        return FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
                   hidden_channels=8, n_layers=3, scan_layers=True, **kw)

    def test_forward_backward(self):
        m = self._model()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
        v = jax.jit(m.init)(jax.random.PRNGKey(1), x)
        w = v["params"]["fno_blocks"]["layers"]["conv"]["w_weight"]
        assert w.shape[0] == 3  # stacked over layers
        y = m.apply(v, x)
        assert y.shape == (2, 1, 16, 16)
        g = jax.grad(lambda p: (m.apply({"params": p}, x) ** 2).sum())(
            v["params"]
        )
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)

    def test_scan_equals_manual_unroll(self):
        """lax.scan over stacked params == sequential per-layer application."""
        from neuraloperator_tpu.layers.scan_fno_block import (
            ScanFNOBlocks,
            _ScanLayer,
        )

        blocks = ScanFNOBlocks(in_channels=8, out_channels=8, n_modes=(4, 4),
                               n_layers=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 12))
        v = jax.jit(blocks.init)(jax.random.PRNGKey(1), x)
        scanned = blocks.apply(v, x)

        from neuraloperator_tpu.layers.channel_mlp import gelu

        layer = _ScanLayer(channels=8, n_modes=(4, 4), fno_skip="linear",
                           channel_mlp_skip="soft-gating",
                           channel_mlp_expansion=0.5,
                           non_linearity=gelu)
        out = x
        stacked = v["params"]["layers"]
        for i in range(3):
            params_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
            out, _ = layer.apply({"params": params_i}, out,
                                 jnp.asarray(i < 2))
        np.testing.assert_allclose(scanned, out, rtol=2e-5, atol=2e-5)

    def test_unsupported_configs_raise(self):
        x = jnp.ones((1, 1, 8, 8))
        for kw in ({"norm": "group_norm"}, {"factorization": "tucker"},
                   {"preactivation": True}):
            with pytest.raises(ValueError):
                jax.eval_shape(
                    lambda m=self._model(**kw): m.init(
                        jax.random.PRNGKey(0), x
                    )
                )
        m = self._model()
        v = jax.jit(m.init)(jax.random.PRNGKey(1), x)
        with pytest.raises(ValueError):
            m.apply(v, x, output_shape=(4, 4))


def test_count_flops():
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.utils import count_flops

    m = FNO(n_modes=(4, 4), in_channels=1, out_channels=1,
            hidden_channels=8, n_layers=1)
    x = jnp.ones((1, 1, 16, 16))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    res = count_flops(lambda p, xx: m.apply({"params": p}, xx),
                      v["params"], x)
    assert res["flops"] > 1e4
    # larger resolution costs more flops
    x2 = jnp.ones((1, 1, 32, 32))
    res2 = count_flops(lambda p, xx: m.apply({"params": p}, xx),
                       v["params"], x2)
    assert res2["flops"] > res["flops"]
