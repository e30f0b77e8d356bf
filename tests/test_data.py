"""Normalizers, data processors, loaders, Darcy dataset."""

import numpy as np
import pytest

from neuraloperator_tpu.data.datasets import DataLoader, TensorDataset
from neuraloperator_tpu.data.datasets.darcy import _find_root, load_darcy_flow_small
from neuraloperator_tpu.data.transforms import (
    DefaultDataProcessor,
    UnitGaussianNormalizer,
)


def test_unit_gaussian_normalizer():
    rng = np.random.RandomState(0)
    data = rng.randn(64, 3, 8, 8) * 5 + 2
    norm = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(data)
    z = np.asarray(norm.transform(data))
    assert np.abs(z.mean(axis=(0, 2, 3))).max() < 1e-4
    assert np.abs(z.std(axis=(0, 2, 3)) - 1).max() < 1e-3
    back = np.asarray(norm.inverse_transform(z))
    np.testing.assert_allclose(back, data, rtol=1e-4, atol=1e-4)


def test_partial_fit_matches_fit():
    rng = np.random.RandomState(1)
    data = rng.randn(40, 2, 4, 4).astype(np.float32)
    full = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(data)
    stream = UnitGaussianNormalizer(dim=[0, 2, 3])
    for chunk in np.split(data, 4):
        stream.partial_fit(chunk)
    np.testing.assert_allclose(full.mean, stream.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(full.std, stream.std, rtol=1e-3, atol=1e-4)


def test_default_data_processor():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 1, 4, 4).astype(np.float32)
    y = rng.randn(8, 1, 4, 4).astype(np.float32) * 3 + 1
    out_norm = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(y)
    dp = DefaultDataProcessor(out_normalizer=out_norm)
    sample = dp.preprocess({"x": x, "y": y}, train=True)
    assert np.abs(np.asarray(sample["y"]).mean()) < 0.1  # normalized in train
    sample_eval = dp.preprocess({"x": x, "y": y}, train=False)
    np.testing.assert_array_equal(np.asarray(sample_eval["y"]), y)  # untouched
    out, _ = dp.postprocess(sample["y"], sample_eval, train=False)
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-4)


def test_dataloader_batching():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    ds = TensorDataset(x, x)
    loader = DataLoader(ds, batch_size=4)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 1)
    assert batches[-1]["x"].shape == (2, 1)
    loader = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(list(loader)) == 2


@pytest.mark.skipif(_find_root() is None, reason="no darcy data available")
def test_load_darcy_flow_small():
    train_loader, test_loaders, dp = load_darcy_flow_small(
        n_train=20,
        n_tests=[10, 10],
        batch_size=4,
        test_batch_sizes=[4, 4],
        test_resolutions=[16, 32],
    )
    batch = next(iter(train_loader))
    assert batch["x"].shape == (4, 1, 16, 16)
    assert batch["y"].shape == (4, 1, 16, 16)
    batch32 = next(iter(test_loaders[32]))
    assert batch32["x"].shape[-1] == 32
    assert dp.out_normalizer is not None
