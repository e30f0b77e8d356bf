"""Serving path: AOT-compiled bucketed forward + jax.export artifacts.

No reference counterpart (ahead of reference); the closest intent is
inference via Trainer.evaluate (/root/reference/neuralop/training/
trainer.py:589-671)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.serving import (
    CompiledForward,
    export_forward,
    load_exported,
)


@pytest.fixture(scope="module")
def small_fno():
    model = FNO(n_modes=(8, 8), in_channels=1, out_channels=1,
                hidden_channels=8, n_layers=2)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 1, 16, 16),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_compiled_forward_buckets_match_eager(small_fno):
    model, params, x = small_fno
    srv = CompiledForward(model, params, x, batch_sizes=(2, 4))
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(srv(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # odd request size pads up to bucket 2 then slices back
    out1 = srv(x[:1])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[:1]),
                               rtol=1e-5, atol=1e-6)
    assert out1.shape[0] == 1
    assert set(srv.compile_seconds) == {2, 4}


def test_compiled_forward_rejects_oversize(small_fno):
    model, params, x = small_fno
    srv = CompiledForward(model, params, x, batch_sizes=(2,))
    with pytest.raises(ValueError, match="largest compiled bucket"):
        srv(jnp.concatenate([x, x], axis=0))


def test_compiled_forward_param_dtype_cast(small_fno):
    model, params, x = small_fno
    srv = CompiledForward(model, params, x, batch_sizes=(4,),
                          param_dtype=jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(srv._params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    ref = model.apply({"params": params}, x)
    # bf16 weights: loose tolerance
    np.testing.assert_allclose(np.asarray(srv(x)), np.asarray(ref),
                               rtol=0.1, atol=0.05)


def test_export_roundtrip_polymorphic_batch(small_fno, tmp_path):
    model, params, x = small_fno
    path = tmp_path / "fno_forward.stablehlo"
    blob = export_forward(model, params, x, path=str(path))
    assert path.read_bytes() == blob
    fn = load_exported(str(path))
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # polymorphic batch: a different leading dim runs the same artifact
    out3 = fn(x[:3])
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref[:3]),
                               rtol=1e-5, atol=1e-6)


def test_export_static_batch(small_fno):
    model, params, x = small_fno
    blob = export_forward(model, params, x, polymorphic_batch=False)
    fn = load_exported(blob)
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_export_roundtrip_tfno_factorized(tmp_path):
    """The factorized (Tucker) contraction path — complex einsums as
    split-real Karatsuba matmuls — must survive export/deserialize."""
    from neuraloperator_tpu.models import TFNO

    model = TFNO(n_modes=(8, 8), in_channels=1, out_channels=1,
                 hidden_channels=8, n_layers=2, rank=0.5)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 1, 16, 16),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    fn = load_exported(export_forward(model, params, x))
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_export_roundtrip_sfno():
    """The spherical (SHT-matmul) path must survive export: Legendre
    analysis/synthesis are real matmuls, longitude is an rDFT."""
    from neuraloperator_tpu.models import SFNO

    model = SFNO(n_modes=(8, 8), in_channels=1, out_channels=1,
                 hidden_channels=8, n_layers=2)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 1, 16, 32),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x)["params"]
    fn = load_exported(export_forward(model, params, x))
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fn(x[:1])),
                               np.asarray(ref[:1]), rtol=1e-5, atol=1e-6)


def test_compiled_forward_postprocess_and_probe_buckets(small_fno):
    """postprocess_fn is baked into the compiled program (the decoder of
    an encode_output=True training run); latency_probe only accepts real
    buckets so the number is attributed to the program that ran."""
    from neuraloperator_tpu.data.transforms.normalizers import (
        UnitGaussianNormalizer,
    )

    model, params, x = small_fno
    norm = UnitGaussianNormalizer(dim=[0, 2, 3])
    norm.fit(np.random.RandomState(7).randn(8, 1, 16, 16) * 3 + 2)
    srv = CompiledForward(model, params, x, batch_sizes=(4,),
                          postprocess_fn=norm.inverse_transform)
    ref = norm.inverse_transform(model.apply({"params": params}, x))
    np.testing.assert_allclose(np.asarray(srv(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="not a compiled bucket"):
        srv.latency_probe(3)
    assert srv.latency_probe(4, iters=1) > 0

    blob = export_forward(model, params, x,
                          postprocess_fn=norm.inverse_transform)
    fn = load_exported(blob)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_compiled_forward_aux_output_leaves_pass_through(small_fno):
    """Leaves without a leading batch axis must not be sliced."""
    model, params, x = small_fno

    class Wrapper:
        def apply(self, variables, a):
            out = model.apply(variables, a)
            return {"y": out, "aux": jnp.float32(3.0)}

    srv = CompiledForward(Wrapper(), params, x, batch_sizes=(4,))
    out = srv(x[:2])
    assert out["y"].shape[0] == 2
    assert float(out["aux"]) == 3.0


def test_compiled_forward_multi_device_dp(small_fno):
    """mesh= serves data-parallel: bucket batch sharded over 'data',
    params replicated; outputs match the single-device endpoint."""
    from neuraloperator_tpu.parallel import mesh as mesh_lib

    model, params, x = small_fno
    ref = CompiledForward(model, params, x, batch_sizes=(4,))(x)
    mesh = mesh_lib.init()  # all devices on 'data'
    srv = CompiledForward(model, params, x, batch_sizes=(8,), mesh=mesh)
    out = srv(jnp.concatenate([x, x], axis=0))
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="not divisible"):
        CompiledForward(model, params, x, batch_sizes=(3,), mesh=mesh)


def test_compiled_forward_int8_quantized(small_fno):
    from neuraloperator_tpu.serving import (
        dequantize_params,
        quantize_params_int8,
    )

    model, params, x = small_fno
    ref = np.asarray(model.apply({"params": params}, x))

    srv = CompiledForward(model, params, x, batch_sizes=(4,),
                          quantize="int8")
    out = np.asarray(srv(x), np.float32)
    # weight-only int8 + bf16 compute: a few % relative output error
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel

    # the stored tree really is int8 for the large leaves
    qtree = quantize_params_int8(params)
    kinds = [
        pair[0].dtype
        for pair in jax.tree_util.tree_leaves(
            qtree, is_leaf=lambda t: isinstance(t, tuple)
        )
        if pair[1] is not None
    ]
    assert kinds and all(d == jnp.int8 for d in kinds)

    # dequantize inverts up to per-row quantization step
    deq = dequantize_params(qtree, jnp.float32)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(deq),
    ):
        step = np.max(np.abs(np.asarray(a)), axis=-1, keepdims=True) / 127.0
        assert np.all(
            np.abs(np.asarray(a) - np.asarray(b, np.float32))
            <= step + 1e-7
        ), jax.tree_util.keystr(path)


def test_compiled_forward_end_to_end_normalizers(small_fno):
    """preprocess_fn + postprocess_fn bake the full data-processor into
    the endpoint: raw-space requests in, raw-space predictions out,
    matching the Trainer's eval pipeline exactly (serve_model.py wires
    these from the checkpoint's data_processor.json sidecar)."""
    from neuraloperator_tpu.data.transforms import DefaultDataProcessor
    from neuraloperator_tpu.data.transforms.normalizers import (
        UnitGaussianNormalizer,
    )

    model, params, x = small_fno
    rng = np.random.RandomState(11)
    in_norm = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(
        rng.randn(8, 1, 16, 16) * 3 + 2
    )
    out_norm = UnitGaussianNormalizer(dim=[0, 2, 3]).fit(
        rng.randn(8, 1, 16, 16) * 0.5 - 1
    )
    dp = DefaultDataProcessor(in_normalizer=in_norm, out_normalizer=out_norm)

    srv = CompiledForward(
        model, params, x, batch_sizes=(4,),
        preprocess_fn=in_norm.transform,
        postprocess_fn=out_norm.inverse_transform,
    )
    # reference: the Trainer's eval path
    sample = dp.preprocess({"x": x}, train=False)
    ref = model.apply({"params": params}, sample["x"])
    ref, _ = dp.postprocess(ref, sample, train=False)
    np.testing.assert_allclose(np.asarray(srv(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    blob = export_forward(model, params, x,
                          preprocess_fn=in_norm.transform,
                          postprocess_fn=out_norm.inverse_transform)
    fn = load_exported(blob)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
