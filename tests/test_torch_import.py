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


def test_sfno_state_dict_roundtrip():
    """SFNO (SphericalConv dhconv) reference layout converts.

    Reference SFNO = FNO with conv_module=SphericalConv; complex weights
    (in, out, l_modes) stored by tltorch ComplexDense as view_as_real
    (reference spherical_convolution.py:364-388, sfno.py:10).
    """
    from neuraloperator_tpu.models import SFNO

    model = SFNO(
        n_modes=(6, 6), in_channels=1, out_channels=1,
        hidden_channels=HID, n_layers=2,
    )
    x = jnp.zeros((1, 1, 8, 16))
    template = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.RandomState(7)

    def conv1d(i, o):
        return torch.from_numpy(rng.randn(o, i, 1).astype(np.float32))

    sd = {}
    sd["lifting.fcs.0.weight"] = conv1d(3, 2 * HID)
    sd["lifting.fcs.0.bias"] = torch.from_numpy(
        rng.randn(2 * HID).astype(np.float32))
    sd["lifting.fcs.1.weight"] = conv1d(2 * HID, HID)
    sd["lifting.fcs.1.bias"] = torch.from_numpy(
        rng.randn(HID).astype(np.float32))
    sd["projection.fcs.0.weight"] = conv1d(HID, 2 * HID)
    sd["projection.fcs.0.bias"] = torch.from_numpy(
        rng.randn(2 * HID).astype(np.float32))
    sd["projection.fcs.1.weight"] = conv1d(2 * HID, 1)
    sd["projection.fcs.1.bias"] = torch.from_numpy(
        rng.randn(1).astype(np.float32))
    for i in range(2):
        # dhconv weight, view_as_real trailing-2 layout
        sd[f"fno_blocks.convs.{i}.weight.tensor"] = torch.from_numpy(
            (0.1 * rng.randn(HID, HID, 6, 2)).astype(np.float32))
        sd[f"fno_blocks.convs.{i}.bias"] = torch.from_numpy(
            rng.randn(HID, 1, 1).astype(np.float32))
        sd[f"fno_blocks.fno_skips.{i}.conv.weight"] = conv1d(HID, HID)
        sd[f"fno_blocks.channel_mlp_skips.{i}.weight"] = torch.from_numpy(
            rng.randn(1, HID, 1, 1).astype(np.float32))
        sd[f"fno_blocks.channel_mlp.{i}.fcs.0.weight"] = conv1d(HID, HID // 2)
        sd[f"fno_blocks.channel_mlp.{i}.fcs.0.bias"] = torch.from_numpy(
            rng.randn(HID // 2).astype(np.float32))
        sd[f"fno_blocks.channel_mlp.{i}.fcs.1.weight"] = conv1d(HID // 2, HID)
        sd[f"fno_blocks.channel_mlp.{i}.fcs.1.bias"] = torch.from_numpy(
            rng.randn(HID).astype(np.float32))

    params = convert_dense_fno_state_dict(sd, template)
    # view_as_real -> split-real mapping is exact
    w_t = sd["fno_blocks.convs.0.weight.tensor"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["fno_blocks"]["conv_0"]["w_weight"]),
        np.moveaxis(w_t, -1, 0))
    out = model.apply({"params": params}, jnp.asarray(
        np.random.RandomState(8).randn(1, 1, 8, 16), jnp.float32))
    assert out.shape == (1, 1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_uno_state_dict_roundtrip():
    """UNO reference layout (`fno_blocks.{i}.*` + `horizontal_skips.{i}`)
    converts onto our block_{i}/horizontal_skip_{i} tree
    (reference uno.py:271-312)."""
    from neuraloperator_tpu.models import UNO

    model = UNO(
        in_channels=1, out_channels=1, hidden_channels=8,
        lifting_channels=16, projection_channels=16, n_layers=3,
        uno_out_channels=(8, 8, 8), uno_n_modes=((4, 4),) * 3,
        uno_scalings=((1, 1), (0.5, 0.5), (2, 2)),
        channel_mlp_skip="linear",
    )
    x = jnp.zeros((1, 1, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.RandomState(9)

    def conv1d(i, o):
        return torch.from_numpy(rng.randn(o, i, 1).astype(np.float32))

    def vec(n):
        return torch.from_numpy(rng.randn(n).astype(np.float32))

    sd = {
        "lifting.fcs.0.weight": conv1d(3, 16),
        "lifting.fcs.0.bias": vec(16),
        "lifting.fcs.1.weight": conv1d(16, 8),
        "lifting.fcs.1.bias": vec(8),
        "projection.fcs.0.weight": conv1d(8, 16),
        "projection.fcs.0.bias": vec(16),
        "projection.fcs.1.weight": conv1d(16, 1),
        "projection.fcs.1.bias": vec(1),
        # horizontal skip from layer 0 to layer 2 (linear)
        "horizontal_skips.0.conv.weight": conv1d(8, 8),
    }
    in_chs = [8, 8, 16]  # block 2 takes the concat of skip + previous
    for i, in_ch in enumerate(in_chs):
        w = 0.1 * (rng.randn(in_ch, 8, 4, 3)
                   + 1j * rng.randn(in_ch, 8, 4, 3))
        sd[f"fno_blocks.{i}.convs.0.weight.tensor"] = torch.from_numpy(
            w.astype(np.complex64))
        sd[f"fno_blocks.{i}.convs.0.bias"] = torch.from_numpy(
            rng.randn(8, 1, 1).astype(np.float32))
        sd[f"fno_blocks.{i}.fno_skips.0.conv.weight"] = conv1d(in_ch, 8)
        sd[f"fno_blocks.{i}.channel_mlp_skips.0.conv.weight"] = conv1d(
            in_ch, 8)
        sd[f"fno_blocks.{i}.channel_mlp.0.fcs.0.weight"] = conv1d(8, 4)
        sd[f"fno_blocks.{i}.channel_mlp.0.fcs.0.bias"] = vec(4)
        sd[f"fno_blocks.{i}.channel_mlp.0.fcs.1.weight"] = conv1d(4, 8)
        sd[f"fno_blocks.{i}.channel_mlp.0.fcs.1.bias"] = vec(8)

    params = convert_dense_fno_state_dict(sd, template)
    np.testing.assert_array_equal(
        np.asarray(params["horizontal_skip_0"]["weight"]),
        sd["horizontal_skips.0.conv.weight"].numpy().squeeze(-1))
    out = model.apply({"params": params}, jnp.asarray(
        np.random.RandomState(10).randn(1, 1, 16, 16), jnp.float32))
    assert out.shape == (1, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_gino_state_dict_roundtrip():
    """GINO reference layout (GNO Linear kernel MLPs + latent FNOBlocks)
    converts; torch Linear weights transpose onto flax Dense kernels
    (reference gino.py:296-378, channel_mlp.py:122-187)."""
    from neuraloperator_tpu.layers.neighbor_search import (
        padded_neighbor_search,
    )
    from neuraloperator_tpu.models import GINO

    rng_np = np.random.RandomState(8)
    n_in, n_out, d3 = 24, 8, 3
    input_geom = jnp.asarray(rng_np.rand(1, n_in, d3), jnp.float32)
    axes = [jnp.linspace(0, 1, 4)] * d3
    latent_queries = jnp.stack(
        jnp.meshgrid(*axes, indexing="ij"), axis=-1)[None]
    output_queries = jnp.asarray(rng_np.rand(1, n_out, d3), jnp.float32)
    xg = jnp.asarray(rng_np.rand(2, n_in, 2), jnp.float32)
    lq_flat = latent_queries.reshape(-1, d3)
    in_nbrs = padded_neighbor_search(input_geom[0], lq_flat, 0.6, 8)
    out_nbrs = padded_neighbor_search(lq_flat, output_queries[0], 0.6, 8)

    model = GINO(
        in_channels=2, out_channels=1, gno_coord_dim=d3, in_gno_radius=0.6,
        out_gno_radius=0.6, fno_in_channels=2, fno_n_modes=(2, 2, 2),
        fno_hidden_channels=4, fno_n_layers=1, gno_max_neighbors=8,
        in_gno_channel_mlp_hidden_layers=(8,),
        out_gno_channel_mlp_hidden_layers=(8,),
    )
    gkw = {"in_neighbors": in_nbrs, "out_neighbors": out_nbrs}
    template = model.init(
        jax.random.PRNGKey(4), input_geom, latent_queries, output_queries,
        xg, **gkw,
    )["params"]

    rng = np.random.RandomState(11)

    def linear(i, o):
        return torch.from_numpy(rng.randn(o, i).astype(np.float32))

    def conv1d(i, o):
        return torch.from_numpy(rng.randn(o, i, 1).astype(np.float32))

    def vec(n):
        return torch.from_numpy(rng.randn(n).astype(np.float32))

    sd = {
        "lifting.fcs.0.weight": conv1d(2, 8), "lifting.fcs.0.bias": vec(8),
        "lifting.fcs.1.weight": conv1d(8, 4), "lifting.fcs.1.bias": vec(4),
        "projection.fcs.0.weight": conv1d(4, 16),
        "projection.fcs.0.bias": vec(16),
        "projection.fcs.1.weight": conv1d(16, 1),
        "projection.fcs.1.bias": vec(1),
        "fno_blocks.convs.0.bias": torch.from_numpy(
            rng.randn(4, 1, 1, 1).astype(np.float32)),
        "fno_blocks.fno_skips.0.conv.weight": conv1d(4, 4),
        "fno_blocks.channel_mlp_skips.0.weight": torch.from_numpy(
            rng.randn(1, 4, 1, 1, 1).astype(np.float32)),
        "fno_blocks.channel_mlp.0.fcs.0.weight": conv1d(4, 2),
        "fno_blocks.channel_mlp.0.fcs.0.bias": vec(2),
        "fno_blocks.channel_mlp.0.fcs.1.weight": conv1d(2, 4),
        "fno_blocks.channel_mlp.0.fcs.1.bias": vec(4),
    }
    w = 0.1 * (rng.randn(4, 4, 2, 2, 2) + 1j * rng.randn(4, 4, 2, 2, 2))
    sd["fno_blocks.convs.0.weight.tensor"] = torch.from_numpy(
        w.astype(np.complex64))
    kin = int(template["gno_in"]["integral_transform"]["channel_mlp"][
        "fc0"]["kernel"].shape[0])
    kout = int(template["gno_out"]["integral_transform"]["channel_mlp"][
        "fc0"]["kernel"].shape[0])
    sd["gno_in.integral_transform.channel_mlp.fcs.0.weight"] = linear(kin, 8)
    sd["gno_in.integral_transform.channel_mlp.fcs.0.bias"] = vec(8)
    sd["gno_in.integral_transform.channel_mlp.fcs.1.weight"] = linear(8, 2)
    sd["gno_in.integral_transform.channel_mlp.fcs.1.bias"] = vec(2)
    sd["gno_out.integral_transform.channel_mlp.fcs.0.weight"] = linear(
        kout, 8)
    sd["gno_out.integral_transform.channel_mlp.fcs.0.bias"] = vec(8)
    sd["gno_out.integral_transform.channel_mlp.fcs.1.weight"] = linear(8, 4)
    sd["gno_out.integral_transform.channel_mlp.fcs.1.bias"] = vec(4)

    params = convert_dense_fno_state_dict(sd, template)
    # torch Linear (out, in) -> flax Dense kernel (in, out)
    np.testing.assert_array_equal(
        np.asarray(
            params["gno_in"]["integral_transform"]["channel_mlp"]["fc0"][
                "kernel"]),
        sd["gno_in.integral_transform.channel_mlp.fcs.0.weight"].numpy().T)
    out = model.apply(
        {"params": params}, input_geom, latent_queries, output_queries, xg,
        **gkw,
    )
    assert out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()
