"""scripts/merge_ns_train_data.py: extension merge is lossless + seeded.

The round-5 flagship-v3 data extension merges a fresh-seed generation
into the canonical ``nsforcing_train_{res}.pt`` (see artifacts/README.md
for the regeneration recipe); this guards that the merge keeps every
pair exactly once, pairs stay aligned (x[i] <-> y[i]), and the reshuffle
is deterministic in the seed.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SCRIPT = Path(__file__).resolve().parents[1] / (
    "scripts/merge_ns_train_data.py"
)


def _load_module():
    spec = importlib.util.spec_from_file_location("merge_ns", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(path, x, y):
    torch.save(
        {"x": torch.from_numpy(x), "y": torch.from_numpy(y)},
        path.as_posix(),
    )


def _run(tmp_path, monkeypatch, base, ext, seed=777):
    mod = _load_module()
    data_dir = tmp_path / "data"
    ext_dir = tmp_path / "ext"
    data_dir.mkdir(exist_ok=True)
    ext_dir.mkdir(exist_ok=True)
    _write(data_dir / "nsforcing_train_8.pt", *base)
    _write(ext_dir / "nsforcing_train_8.pt", *ext)
    monkeypatch.setattr(mod, "DATA_DIR", data_dir)
    monkeypatch.setattr(
        sys, "argv",
        ["merge", "--ext-dir", str(ext_dir), "--res", "8",
         "--shuffle-seed", str(seed)],
    )
    mod.main()
    merged = torch.load(
        (data_dir / "nsforcing_train_8.pt").as_posix(), weights_only=True
    )
    return merged["x"].numpy(), merged["y"].numpy()


def _pairs(n, offset=0.0):
    rng = np.random.default_rng(int(offset) + 1)
    x = rng.standard_normal((n, 1, 8, 8)).astype(np.float32) + offset
    # y derived from x so alignment corruption is detectable
    y = (2.0 * x + 1.0).astype(np.float32)
    return x, y


def test_merge_is_lossless_and_aligned(tmp_path, monkeypatch):
    base, ext = _pairs(6), _pairs(4, offset=100.0)
    x, y = _run(tmp_path, monkeypatch, base, ext)
    assert x.shape == (10, 1, 8, 8)
    # every pair present exactly once (match on a per-sample fingerprint)
    want = np.sort(
        np.concatenate([base[0], ext[0]]).reshape(10, -1).sum(axis=1)
    )
    got = np.sort(x.reshape(10, -1).sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # alignment survives the shuffle
    np.testing.assert_allclose(y, 2.0 * x + 1.0, rtol=1e-6)


def test_merge_shuffle_is_seed_deterministic(tmp_path, monkeypatch):
    x1, _ = _run(tmp_path, monkeypatch, _pairs(6), _pairs(4, 100.0), seed=3)
    x2, _ = _run(tmp_path, monkeypatch, _pairs(6), _pairs(4, 100.0), seed=3)
    x3, _ = _run(tmp_path, monkeypatch, _pairs(6), _pairs(4, 100.0), seed=4)
    np.testing.assert_array_equal(x1, x2)
    assert not np.array_equal(x1, x3)
