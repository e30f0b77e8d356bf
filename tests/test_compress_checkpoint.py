"""Tests for ``scripts/compress_checkpoint.py`` (bf16 checkpoint compression).

The tool backs the artifacts/ policy (artifacts/README.md): large f32
checkpoints may be committed at half size when the bf16 cast is shown to
be eval-equivalent. Exercised end-to-end here on a Trainer-layout
checkpoint (``save_training_state`` + ``save_arch_metadata``).
"""

import importlib.util
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "compress_checkpoint", REPO / "scripts" / "compress_checkpoint.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_checkpoint(tmp_path):
    from neuraloperator_tpu.models import FNO
    from neuraloperator_tpu.models.base_model import save_arch_metadata
    from neuraloperator_tpu.training import save_training_state

    model = FNO(
        n_modes=(4, 4),
        in_channels=1,
        out_channels=1,
        hidden_channels=8,
        n_layers=2,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    save_training_state(tmp_path, "best_model", params, epoch=3)
    save_arch_metadata(model, tmp_path, "best_model")
    return model, params, x


def _run(tmp_path, monkeypatch, capsys, extra=()):
    mod = _load_script()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "compress_checkpoint.py",
            "--dir", str(tmp_path),
            "--name", "best_model",
            "--spatial", "16",
            "--batch", "2",
            *extra,
        ],
    )
    mod.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_compress_writes_half_size_bf16(tmp_path, monkeypatch, capsys):
    _tiny_checkpoint(tmp_path)
    result = _run(tmp_path, monkeypatch, capsys)
    out = tmp_path / "best_model_bf16.msgpack"
    assert out.exists()
    assert result["out_bytes"] == out.stat().st_size
    # every f32 leaf halves; msgpack framing overhead is small
    assert result["out_bytes"] < 0.65 * result["in_bytes"]

    import flax.serialization

    tree = flax.serialization.msgpack_restore(out.read_bytes())
    dtypes = {
        leaf.dtype for leaf in jax.tree_util.tree_leaves(tree)
        if isinstance(leaf, np.ndarray)
    }
    assert jnp.bfloat16 in {jnp.dtype(d) for d in dtypes} or all(
        str(d) == "bfloat16" for d in dtypes
    )


def test_compress_f16_and_decompress_on_load(tmp_path, monkeypatch, capsys):
    """--dtype f16 writes *_f16.msgpack; load_training_state restores it
    to the template's f32 (decompress-on-load)."""
    model, params, x = _tiny_checkpoint(tmp_path)
    result = _run(tmp_path, monkeypatch, capsys, extra=("--dtype", "f16"))
    out = tmp_path / "best_model_f16.msgpack"
    assert out.exists()
    # f16 keeps 3 more mantissa bits than bf16: tighter equivalence
    assert 0.0 <= result["eval_rel_l2_f16_vs_f32"] < 3e-3

    from neuraloperator_tpu.training import load_training_state

    restored, _, _ = load_training_state(tmp_path, "best_model_f16", params)
    for t, r in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        assert r.dtype == t.dtype  # f32 again, not f16
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(r), rtol=2e-3, atol=1e-6
        )


def test_compress_eval_equivalence_recorded(tmp_path, monkeypatch, capsys):
    model, params, x = _tiny_checkpoint(tmp_path)
    result = _run(tmp_path, monkeypatch, capsys)
    # the recorded equivalence number exists and the cast is benign on a
    # fresh-init model (bf16 has ~3 decimal digits; outputs are O(1))
    rel = result["eval_rel_l2_bf16_vs_f32"]
    assert 0.0 <= rel < 2e-2

    # the bf16 tree actually reproduces the f32 outputs that closely
    import flax.serialization

    tree16 = flax.serialization.msgpack_restore(
        (tmp_path / "best_model_bf16.msgpack").read_bytes()
    )
    y32 = model.apply({"params": params}, x)
    y16 = model.apply({"params": tree16}, x)
    rel2 = float(
        jnp.linalg.norm(y16.astype(jnp.float32) - y32)
        / jnp.linalg.norm(y32)
    )
    assert rel2 < 2e-2


def test_compress_no_eval_flag(tmp_path, monkeypatch, capsys):
    _tiny_checkpoint(tmp_path)
    result = _run(tmp_path, monkeypatch, capsys, extra=("--no-eval",))
    assert "eval_rel_l2_bf16_vs_f32" not in result
    assert (tmp_path / "best_model_bf16.msgpack").exists()
