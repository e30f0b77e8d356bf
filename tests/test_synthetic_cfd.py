"""Synthetic car-CFD-style generator: schema, geometry and learnability."""

import numpy as np

from neuraloperator_tpu.data.datasets.synthetic_cfd import (
    generate_cfd_sample,
    load_synthetic_cfd,
)


def test_sample_schema_matches_mini_car():
    rng = np.random.default_rng(0)
    s = generate_cfd_sample(rng, n_verts=256, grid_n=8)
    assert s["vertices"].shape == (256, 3)
    assert s["vertex_normals"].shape == (256, 3)
    assert s["press"].shape == (1, 256)
    assert s["query_points"].shape == (8, 8, 8, 3)
    assert s["distance"].shape == (8, 8, 8, 1)
    assert s["closest_points"].shape == (8, 8, 8, 3)
    for v in s.values():
        assert v.dtype == np.float32
        assert np.isfinite(v).all()


def test_normals_are_unit_and_outward():
    rng = np.random.default_rng(1)
    s = generate_cfd_sample(rng, n_verts=512, grid_n=8)
    n = s["vertex_normals"]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    # outward: positive projection onto the (centered) radial direction
    v = s["vertices"]
    r = v / np.linalg.norm(v, axis=-1, keepdims=True)
    assert ((n * r).sum(-1) > 0).mean() > 0.99


def test_pressure_is_geometry_dependent_and_bounded():
    rng = np.random.default_rng(2)
    a = generate_cfd_sample(rng, n_verts=256, grid_n=8)
    b = generate_cfd_sample(rng, n_verts=256, grid_n=8)
    # stagnation cp ~ 1 at noses, suction negative on flanks
    assert a["press"].max() <= 1.05
    assert a["press"].min() < 0.0
    assert not np.allclose(a["press"], b["press"])  # varies with geometry


def test_sdf_sign_and_surface_zero():
    rng = np.random.default_rng(3)
    s = generate_cfd_sample(rng, n_verts=512, grid_n=12)
    sdf = s["distance"][..., 0]
    assert (sdf < 0).any() and (sdf > 0).any()  # inside + outside points
    # sdf magnitude at grid points nearest the surface is small
    assert np.abs(sdf).min() < 0.15


def test_load_cache_roundtrip(tmp_path):
    cache = str(tmp_path / "cfd.npz")
    a = load_synthetic_cfd(3, n_verts=128, grid_n=6, cache=cache)
    b = load_synthetic_cfd(2, n_verts=128, grid_n=6, cache=cache)
    assert len(a) == 3 and len(b) == 2
    np.testing.assert_array_equal(a[0]["press"], b[0]["press"])
