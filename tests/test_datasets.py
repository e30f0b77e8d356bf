"""Dataset module tests: OT Sinkhorn, spherical SWE, mesh/car data, Poisson."""

import numpy as np
import pytest

from neuraloperator_tpu.data.datasets import (
    NonlinearPoissonDataset,
    OTDataModule,
    SphericalSWESolver,
    load_spherical_swe,
    sinkhorn_log,
)
from neuraloperator_tpu.data.datasets.car_cfd_dataset import load_mini_car


def test_sinkhorn_marginals():
    rng = np.random.RandomState(0)
    n, m = 20, 30
    C = rng.rand(n, m)
    a = np.full(n, 1.0 / n)
    b = np.full(m, 1.0 / m)
    P = sinkhorn_log(a, b, C, reg=0.05, n_iters=500)
    np.testing.assert_allclose(P.sum(1), a, atol=1e-4)
    np.testing.assert_allclose(P.sum(0), b, atol=1e-4)


def test_ot_datamodule_maps():
    rng = np.random.RandomState(0)
    verts = rng.randn(100, 3).astype(np.float32)
    dm = OTDataModule(verts, latent_size=8, reg=0.05, n_iters=100)
    assert dm.ind_enc.shape == (64,)
    assert dm.ind_dec.shape == (100,)
    feats = dm.transported_features(verts)
    assert feats.shape == (1, 6, 8, 8)


def test_spherical_swe_solver():
    solver = SphericalSWESolver(nlat=16, nlon=32)
    rng = np.random.default_rng(0)
    x0 = solver.random_state(rng)
    assert x0.shape == (3, 16, 32)
    x1 = solver.step(x0)
    assert x1.shape == x0.shape
    # dynamics move the state but keep it bounded
    assert not np.allclose(x0, x1)
    assert np.abs(x1).max() < 10 * (np.abs(x0).max() + 1e-6)


def test_load_spherical_swe_loaders():
    train_loader, test_loaders, dp = load_spherical_swe(
        n_train=4, n_test=2, batch_size=2, test_batch_sizes=(2,),
        train_resolution=(16, 32), test_resolutions=((16, 32),),
    )
    batch = next(iter(train_loader))
    assert batch["x"].shape == (2, 3, 16, 32)


def test_load_mini_car():
    try:
        samples = load_mini_car()
    except FileNotFoundError:
        pytest.skip("mini_car.pt not available")
    assert len(samples) == 3
    assert samples[0]["vertices"].shape[-1] == 3
    assert "press" in samples[0]


def test_nonlinear_poisson_synthetic():
    ds = NonlinearPoissonDataset(n_train=2, n_test=1)
    sample = ds.train_data[0]
    assert sample["input_geom"].shape[-1] == 2
    assert sample["y"].shape[0] == sample["input_geom"].shape[0]
    assert int(sample["num_boundary"]) > 0


def test_prefetch_loader_matches_plain():
    import jax
    import numpy as np

    from neuraloperator_tpu.data.datasets import (
        DataLoader,
        PrefetchLoader,
        TensorDataset,
    )

    rng = np.random.RandomState(0)
    x = rng.randn(20, 1, 8, 8).astype(np.float32)
    ds = TensorDataset(x, 2 * x)
    plain = list(DataLoader(ds, 8))
    pre = list(PrefetchLoader(DataLoader(ds, 8), depth=2))
    assert len(pre) == len(plain) == 3
    for a, b in zip(plain, pre):
        assert isinstance(b["x"], jax.Array)  # device-resident
        np.testing.assert_array_equal(np.asarray(b["x"]), a["x"])
        np.testing.assert_array_equal(np.asarray(b["y"]), a["y"])


def test_prefetch_loader_propagates_errors():
    import pytest as _pytest

    from neuraloperator_tpu.data.datasets import PrefetchLoader

    def bad_gen():
        yield {"x": __import__("numpy").ones(3)}
        raise RuntimeError("loader exploded")

    class Bad:
        def __iter__(self):
            return bad_gen()

        def __len__(self):
            return 2

    loader = PrefetchLoader(Bad(), depth=1)
    with _pytest.raises(RuntimeError, match="loader exploded"):
        list(loader)

    with _pytest.raises(ValueError):
        PrefetchLoader(Bad(), depth=0)


def test_the_well_wrappers_with_stubbed_package(monkeypatch):
    """Exercise the the_well wrapper code paths with a minimal stub of the
    optional package (absent in this environment): construction kwargs
    passthrough, dict conversion, subclass dataset names."""
    import sys
    import types

    import numpy as np

    class _FakeWellDataset:
        def __init__(self, well_base_path, well_dataset_name,
                     well_split_name, n_steps_input, n_steps_output,
                     **kwargs):
            self.name = well_dataset_name
            self.split = well_split_name
            self.n_in, self.n_out = n_steps_input, n_steps_output

        def __len__(self):
            return 3

        def __getitem__(self, idx):
            return {
                "input_fields": np.zeros((self.n_in, 4, 4, 2), np.float32),
                "output_fields": np.ones((self.n_out, 4, 4, 2), np.float32),
                "name": self.name,
            }

    fake_pkg = types.ModuleType("the_well")
    fake_data = types.ModuleType("the_well.data")
    fake_data.WellDataset = _FakeWellDataset
    fake_pkg.data = fake_data
    monkeypatch.setitem(sys.modules, "the_well", fake_pkg)
    monkeypatch.setitem(sys.modules, "the_well.data", fake_data)

    from neuraloperator_tpu.data.datasets.the_well_dataset import (
        ActiveMatterDataset,
        MHD64Dataset,
        WellDataset,
    )

    ds = WellDataset("/tmp/well", "active_matter", "train",
                     n_steps_input=2, n_steps_output=1)
    assert len(ds) == 3
    item = ds[0]
    assert item["input_fields"].shape == (2, 4, 4, 2)
    assert item["name"] == "active_matter"

    am = ActiveMatterDataset("/tmp/well")
    assert am[0]["name"] == "active_matter"
    mhd = MHD64Dataset("/tmp/well", well_split_name="valid")
    assert mhd._ds.split == "valid"
    assert mhd[0]["name"] == "MHD_64"


def test_the_well_wrappers_raise_without_package():
    import pytest as _pytest

    from neuraloperator_tpu.data.datasets.the_well_dataset import WellDataset

    with _pytest.raises(ImportError, match="the_well"):
        WellDataset("/tmp/well", "active_matter", "train")
