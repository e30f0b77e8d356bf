"""Reference-checkpoint import: torch state_dict -> flax params.

Constructs reference-format tensors (the documented layouts of
``/root/reference/neuralop``: tltorch DenseTensor complex spectral weights,
Conv1d-k1 ChannelMLPs, soft-gating skips), converts them, and asserts
layer-level output parity against the independent numpy oracle of the
reference's fftshift-centered SpectralConv semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuraloperator_tpu.layers.spectral_convolution import (  # noqa: E402
    SpectralConv,
    to_real_storage,
)
from neuraloperator_tpu.models import FNO  # noqa: E402
from neuraloperator_tpu.models.torch_import import (  # noqa: E402
    convert_dense_fno_state_dict,
    load_reference_fno_checkpoint,
)
from tests.test_spectral_conv import numpy_reference  # noqa: E402

HID, NM = 8, (8, 8)


def _reference_style_state_dict(rng, in_ch=3, out_ch=1, n_layers=2):
    """A state dict with the reference FNO's exact key/shape layout."""
    sd = {}
    lift_mid = 2 * HID  # lifting_channel_ratio=2
    proj_mid = 2 * HID
    grid_ch = in_ch + 2  # GridEmbedding2D appends 2 coord channels

    def conv1d(i, o):
        return torch.from_numpy(rng.randn(o, i, 1).astype(np.float32))

    sd["lifting.fcs.0.weight"] = conv1d(grid_ch, lift_mid)
    sd["lifting.fcs.0.bias"] = torch.from_numpy(
        rng.randn(lift_mid).astype(np.float32))
    sd["lifting.fcs.1.weight"] = conv1d(lift_mid, HID)
    sd["lifting.fcs.1.bias"] = torch.from_numpy(
        rng.randn(HID).astype(np.float32))
    sd["projection.fcs.0.weight"] = conv1d(HID, proj_mid)
    sd["projection.fcs.0.bias"] = torch.from_numpy(
        rng.randn(proj_mid).astype(np.float32))
    sd["projection.fcs.1.weight"] = conv1d(proj_mid, out_ch)
    sd["projection.fcs.1.bias"] = torch.from_numpy(
        rng.randn(out_ch).astype(np.float32))

    m1, m2h = NM[0], NM[1] // 2 + 1
    for i in range(n_layers):
        w = rng.randn(HID, HID, m1, m2h) + 1j * rng.randn(HID, HID, m1, m2h)
        sd[f"fno_blocks.convs.{i}.weight.tensor"] = torch.from_numpy(
            (0.05 * w).astype(np.complex64))
        sd[f"fno_blocks.convs.{i}.bias"] = torch.from_numpy(
            rng.randn(HID, 1, 1).astype(np.float32))
        sd[f"fno_blocks.fno_skips.{i}.conv.weight"] = conv1d(HID, HID)
        sd[f"fno_blocks.channel_mlp_skips.{i}.weight"] = torch.from_numpy(
            rng.randn(1, HID, 1, 1).astype(np.float32))
        mid = HID // 2  # channel_mlp_expansion=0.5
        sd[f"fno_blocks.channel_mlp.{i}.fcs.0.weight"] = conv1d(HID, mid)
        sd[f"fno_blocks.channel_mlp.{i}.fcs.0.bias"] = torch.from_numpy(
            rng.randn(mid).astype(np.float32))
        sd[f"fno_blocks.channel_mlp.{i}.fcs.1.weight"] = conv1d(mid, HID)
        sd[f"fno_blocks.channel_mlp.{i}.fcs.1.bias"] = torch.from_numpy(
            rng.randn(HID).astype(np.float32))
    sd["_metadata"] = {"n_modes": NM, "_version": "0.3.0"}
    return sd


def _our_model(in_ch=3, out_ch=1, n_layers=2):
    return FNO(
        n_modes=NM, in_channels=in_ch, out_channels=out_ch,
        hidden_channels=HID, n_layers=n_layers, lifting_channel_ratio=2,
        projection_channel_ratio=2,
    )


def test_convert_covers_every_parameter():
    rng = np.random.RandomState(0)
    sd = _reference_style_state_dict(rng)
    model = _our_model()
    x = jnp.zeros((1, 3, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x)["params"]
    params = convert_dense_fno_state_dict(sd, template)
    # identical tree structure + shapes, and values actually landed
    ref_leaves = jax.tree_util.tree_leaves(template)
    got_leaves = jax.tree_util.tree_leaves(params)
    assert len(ref_leaves) == len(got_leaves)
    out = model.apply({"params": params}, jnp.asarray(
        np.random.RandomState(1).randn(2, 3, 16, 16), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_keys_raise():
    with pytest.raises(ValueError, match="unconverted"):
        convert_dense_fno_state_dict(
            {"fno_blocks.some_unknown_module.0.weight": torch.zeros(3)}
        )


def test_spectral_layer_parity_with_reference_semantics():
    """A reference-format complex weight run through OUR SpectralConv
    matches the independent numpy oracle of the reference's
    fftshift-centered forward (spectral_convolution.py:417-570)."""
    rng = np.random.RandomState(2)
    m1, m2h = NM[0], NM[1] // 2 + 1
    w_ref = (rng.randn(HID, HID, m1, m2h)
             + 1j * rng.randn(HID, HID, m1, m2h)).astype(np.complex64)
    x = rng.randn(2, HID, 16, 16).astype(np.float32)

    expected = numpy_reference(
        x, w_ref, n_modes=[NM[0], m2h], max_n_modes=[NM[0], m2h]
    )

    conv = SpectralConv(
        in_channels=HID, out_channels=HID, n_modes=NM, use_bias=False
    )
    params = {"w_weight": np.asarray(to_real_storage(jnp.asarray(w_ref)))}
    got = conv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), expected, rtol=2e-4, atol=2e-5
    )


def test_checkpoint_folder_roundtrip(tmp_path):
    """Reference save_checkpoint layout (base_model.py:147-157) loads."""
    rng = np.random.RandomState(3)
    sd = _reference_style_state_dict(rng)
    torch.save(sd, tmp_path / "model_state_dict.pt")
    torch.save({"n_modes": NM, "_version": "0.3.0"},
               tmp_path / "model_metadata.pkl")

    model = _our_model()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16))
    )["params"]
    params, kwargs = load_reference_fno_checkpoint(
        tmp_path, "model", template
    )
    assert kwargs["n_modes"] == NM
    out = model.apply({"params": params}, jnp.asarray(
        np.random.RandomState(4).randn(1, 3, 16, 16), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("factorization", ["tucker", "cp", "tt"])
def test_factorized_state_dict_roundtrip(factorization):
    """tltorch-layout factorized weights convert onto our factor storage.

    Builds the reference-format state dict FROM our own factorized params
    (reverse mapping, using torch's view_as_real layout for the complex
    factors) and checks the converter reproduces the original tree.
    """
    model = FNO(
        n_modes=NM, in_channels=3, out_channels=1, hidden_channels=HID,
        n_layers=2, lifting_channel_ratio=2, projection_channel_ratio=2,
        factorization=factorization, rank=0.5, implementation="factorized",
    )
    x = jnp.zeros((1, 3, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x)["params"]

    def to_torch_real2(storage):
        # (2, ...) split-real -> view_as_real (..., 2)
        return torch.from_numpy(
            np.moveaxis(np.asarray(storage, np.float32), 0, -1).copy()
        )

    sd = {}
    for mod in ("lifting", "projection"):
        for j in (0, 1):
            sd[f"{mod}.fcs.{j}.weight"] = torch.from_numpy(
                np.asarray(template[mod][f"w{j}"])[..., None].copy())
            sd[f"{mod}.fcs.{j}.bias"] = torch.from_numpy(
                np.asarray(template[mod][f"b{j}"]).copy())
    for i in range(2):
        conv = template["fno_blocks"][f"conv_{i}"]
        for name, val in conv.items():
            if name == "bias":
                sd[f"fno_blocks.convs.{i}.bias"] = torch.from_numpy(
                    np.asarray(val).copy())
            elif name == "w_core":
                sd[f"fno_blocks.convs.{i}.weight.core"] = to_torch_real2(val)
            elif name == "w_lambdas":
                sd[f"fno_blocks.convs.{i}.weight.weights"] = to_torch_real2(val)
            elif name.startswith("w_factor_"):
                j = name.split("_")[-1]
                sd[f"fno_blocks.convs.{i}.weight.factors.{j}"] = (
                    to_torch_real2(val))
        blk = template["fno_blocks"]
        sd[f"fno_blocks.fno_skips.{i}.conv.weight"] = torch.from_numpy(
            np.asarray(blk[f"fno_skip_{i}"]["weight"])[..., None].copy())
        sd[f"fno_blocks.channel_mlp_skips.{i}.weight"] = torch.from_numpy(
            np.asarray(blk[f"channel_mlp_skip_{i}"]["weight"]).copy())
        for j in (0, 1):
            sd[f"fno_blocks.channel_mlp.{i}.fcs.{j}.weight"] = (
                torch.from_numpy(np.asarray(
                    blk[f"channel_mlp_{i}"][f"w{j}"])[..., None].copy()))
            sd[f"fno_blocks.channel_mlp.{i}.fcs.{j}.bias"] = torch.from_numpy(
                np.asarray(blk[f"channel_mlp_{i}"][f"b{j}"]).copy())

    params = convert_dense_fno_state_dict(sd, template)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(template)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    out = model.apply({"params": params}, jnp.asarray(
        np.random.RandomState(5).randn(1, 3, 16, 16), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
