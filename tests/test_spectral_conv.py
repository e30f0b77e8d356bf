"""SpectralConv correctness: independent-DFT parity, factorizations, shapes.

Mirrors the reference test strategy
(``neuralop/layers/tests/test_spectral_convolution.py``): factorized ==
dense given the same reconstructed weight, dynamic mode truncation, and
resolution scaling — plus a ground-truth check against an independent numpy
implementation of the documented fftshift-centered mode-selection semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraloperator_tpu.layers.spectral_convolution import (
    SpectralConv,
    spectral_conv_forward,
    halve_last_mode,
)
from neuraloperator_tpu.tensor.factorized import (
    FactorizationSpec,
    init_factors,
    resolve_spec,
    to_tensor,
)


def numpy_reference(x, w, n_modes, max_n_modes, fft_norm="forward"):
    """Independent numpy model of the reference SpectralConv semantics
    (spectral_convolution.py:417-570): fftshift + centered slices +
    Hermitian-enforced inverse."""
    b, cin, *sizes = x.shape
    order = len(sizes)
    fft_size = list(sizes)
    fft_size[-1] = fft_size[-1] // 2 + 1
    xf = np.fft.rfftn(x, axes=tuple(range(-order, 0)), norm=fft_norm)
    if order > 1:
        xf = np.fft.fftshift(xf, axes=tuple(range(-order, -1)))
    cout = w.shape[1]
    out_fft = np.zeros([b, cout] + fft_size, dtype=complex)
    starts = [mx - min(sz, nm) for sz, nm, mx in zip(fft_size, n_modes, max_n_modes)]
    sl_w = [slice(None), slice(None)]
    sl_w += [slice(s // 2, -s // 2) if s else slice(None) for s in starts[:-1]]
    sl_w += [slice(None, -starts[-1]) if starts[-1] else slice(None)]
    ws = w[tuple(sl_w)]
    sl_x = [slice(None), slice(None)]
    for n, k in zip(fft_size, ws.shape[2:]):
        c = n // 2
        sl_x.append(slice(c - k // 2, c + k // 2 + k % 2))
    sl_x[-1] = (
        slice(None, ws.shape[-1]) if ws.shape[-1] < fft_size[-1] else slice(None)
    )
    sl_x = tuple(sl_x)
    out_fft[sl_x] = np.einsum("bi...,io...->bo...", xf[sl_x], ws)
    if order > 1:
        out_fft = np.fft.ifftshift(out_fft, axes=tuple(range(-order, -1)))
    tmp = (
        np.fft.ifftn(out_fft, axes=tuple(range(-order, -1)), norm=fft_norm)
        if order > 1
        else out_fft.copy()
    )
    tmp[..., 0] = tmp[..., 0].real
    if sizes[-1] % 2 == 0:
        tmp[..., -1] = tmp[..., -1].real
    return np.fft.irfft(tmp, n=sizes[-1], axis=-1, norm=fft_norm)


@pytest.mark.parametrize(
    "sizes,n_modes_full",
    [
        ((12, 12), (8, 8)),
        ((13, 11), (8, 6)),
        ((16, 16), (16, 16)),
        ((9,), (5,)),
        ((8, 10, 6), (4, 6, 4)),
        ((12, 12), (7, 5)),
        ((6, 6), (12, 12)),  # more modes than resolution
    ],
)
def test_matches_independent_dft(sizes, n_modes_full):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *sizes)
    n_modes = halve_last_mode(n_modes_full, complex_data=False)
    max_n = list(n_modes)
    w = rng.randn(3, 4, *max_n) + 1j * rng.randn(3, 4, *max_n)
    expected = numpy_reference(x, w, n_modes, max_n)
    spec = FactorizationSpec("dense", tuple(w.shape))
    got = spectral_conv_forward(
        jnp.asarray(x, jnp.float32),
        spec,
        {"weight": jnp.asarray(w, jnp.complex64)},
        bias=None,
        n_modes=n_modes,
        max_n_modes=max_n,
        complex_data=False,
        separable=False,
        implementation="reconstructed",
        fft_norm="forward",
        fno_block_precision="full",
        enforce_hermitian_symmetry=True,
        resolution_scaling_factor=None,
        output_shape=None,
        out_channels=4,
    )
    err = np.abs(np.asarray(got) - expected).max() / (np.abs(expected).max() + 1e-12)
    assert err < 3e-5, err


def test_incremental_modes_match_dft():
    """n_modes < max_n_modes indexes the weight center (iFNO semantics)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16)
    max_n = [12, 7]
    n_modes = [8, 5]
    w = rng.randn(3, 4, *max_n) + 1j * rng.randn(3, 4, *max_n)
    expected = numpy_reference(x, w, n_modes, max_n)
    spec = FactorizationSpec("dense", tuple(w.shape))
    got = spectral_conv_forward(
        jnp.asarray(x, jnp.float32),
        spec,
        {"weight": jnp.asarray(w, jnp.complex64)},
        bias=None,
        n_modes=n_modes,
        max_n_modes=max_n,
        complex_data=False,
        separable=False,
        implementation="reconstructed",
        fft_norm="forward",
        fno_block_precision="full",
        enforce_hermitian_symmetry=True,
        resolution_scaling_factor=None,
        output_shape=None,
        out_channels=4,
    )
    err = np.abs(np.asarray(got) - expected).max() / np.abs(expected).max()
    assert err < 3e-5


@pytest.mark.parametrize("factorization", ["cp", "tucker", "tt"])
@pytest.mark.parametrize("separable", [False, True])
def test_factorized_matches_reconstructed(factorization, separable):
    """factorized-contraction output == contraction with reconstructed weight
    (reference test_spectral_convolution.py:57-65)."""
    rng = jax.random.PRNGKey(0)
    cin = cout = 4
    sizes = (12, 12)
    n_modes = halve_last_mode((8, 8), False)
    shape = (cin, *n_modes) if separable else (cin, cout, *n_modes)
    spec = resolve_spec(factorization, shape, rank=0.5)
    params = init_factors(rng, spec, std=0.1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cin, *sizes))

    kwargs = dict(
        bias=None,
        n_modes=n_modes,
        max_n_modes=list(n_modes),
        complex_data=False,
        separable=separable,
        fft_norm="forward",
        fno_block_precision="full",
        enforce_hermitian_symmetry=True,
        resolution_scaling_factor=None,
        output_shape=None,
        out_channels=cout,
    )
    y_fact = spectral_conv_forward(
        x, spec, params, implementation="factorized", **kwargs
    )
    y_recon = spectral_conv_forward(
        x, spec, params, implementation="reconstructed", **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(y_fact), np.asarray(y_recon), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_module_forward_backward(dim):
    sizes = (12,) * dim
    modes = (6,) * dim
    conv = SpectralConv(in_channels=3, out_channels=5, n_modes=modes)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, *sizes))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (2, 5, *sizes)

    grads = jax.grad(lambda p: jnp.sum(conv.apply({"params": p}, x) ** 2))(
        variables["params"]
    )
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.any(np.asarray(leaf) != 0)


def test_resolution_scaling():
    conv = SpectralConv(
        in_channels=3, out_channels=3, n_modes=(6, 6), resolution_scaling_factor=2
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 12))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (2, 3, 24, 24)

    conv = SpectralConv(
        in_channels=3, out_channels=3, n_modes=(6, 6), resolution_scaling_factor=0.5
    )
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (2, 3, 6, 6)


def test_output_shape_override():
    conv = SpectralConv(in_channels=2, out_channels=2, n_modes=(4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 10, 10))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x, output_shape=(13, 9))
    assert y.shape == (1, 2, 13, 9)


def test_complex_data_roundtrip():
    conv = SpectralConv(
        in_channels=2, out_channels=2, n_modes=(4, 4), complex_data=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8)) + 1j * (
        jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8))
    )
    variables = conv.init(jax.random.PRNGKey(2), x)
    y = conv.apply(variables, x)
    assert y.shape == x.shape
    assert jnp.iscomplexobj(y)


def test_dynamic_n_modes_call_override():
    """Passing a smaller n_modes at call time keeps shapes and changes output."""
    conv = SpectralConv(
        in_channels=2, out_channels=2, n_modes=(8, 8), max_n_modes=(8, 5)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y_full = conv.apply(variables, x)
    y_small = conv.apply(variables, x, n_modes=(4, 4))
    assert y_full.shape == y_small.shape == x.shape[:1] + (2, 16, 16)
    assert not np.allclose(np.asarray(y_full), np.asarray(y_small))


class TestTruncatedDFT:
    """ops/fourier.py DFT-matmul primitives vs numpy FFT ground truth."""

    @pytest.mark.parametrize("n,kept", [(16, 8), (15, 7), (12, 12), (9, 4)])
    def test_dft_gather_matches_fft_plus_centered_gather(self, n, kept):
        from neuraloperator_tpu.ops.fourier import (
            dft_gather_axis, kept_mode_counts,
        )

        rng = np.random.RandomState(0)
        z = rng.randn(3, n) + 1j * rng.randn(3, n)
        ref_full = np.fft.fft(z, axis=-1) / n  # norm='forward'
        neg, pos = kept_mode_counts(kept, n)
        ref = np.concatenate(
            [ref_full[:, n - neg:], ref_full[:, :pos]], axis=-1
        )
        gr, gi = dft_gather_axis(
            jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32),
            kept, -1, "forward",
        )
        np.testing.assert_allclose(np.asarray(gr), ref.real, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gi), ref.imag, atol=1e-5)

    @pytest.mark.parametrize("n_out,kept", [(16, 8), (15, 7), (20, 9)])
    def test_dft_scatter_matches_scatter_plus_ifft(self, n_out, kept):
        from neuraloperator_tpu.ops.fourier import dft_scatter_axis

        rng = np.random.RandomState(1)
        block = rng.randn(2, kept) + 1j * rng.randn(2, kept)
        neg = kept // 2
        spec = np.zeros((2, n_out), complex)
        spec[:, : kept - neg] = block[:, neg:]
        spec[:, n_out - neg:] = block[:, :neg]
        ref = np.fft.ifft(spec, axis=-1) * n_out  # inverse of norm='forward'
        sr, si = dft_scatter_axis(
            jnp.asarray(block.real, jnp.float32),
            jnp.asarray(block.imag, jnp.float32),
            n_out, -1, "forward",
        )
        np.testing.assert_allclose(np.asarray(sr), ref.real, atol=1e-4)
        np.testing.assert_allclose(np.asarray(si), ref.imag, atol=1e-4)

    @pytest.mark.parametrize("n,kept", [(16, 9), (16, 5), (15, 8), (8, 5)])
    def test_rdft_roundtrip_matches_rfft_irfft(self, n, kept):
        from neuraloperator_tpu.ops.fourier import (
            rdft_gather_last, rdft_scatter_last,
        )

        rng = np.random.RandomState(2)
        x = rng.randn(4, n).astype(np.float32)
        ref_c = np.fft.rfft(x, axis=-1)[:, :kept] / n
        cr, ci = rdft_gather_last(jnp.asarray(x), kept, "forward")
        np.testing.assert_allclose(np.asarray(cr), ref_c.real, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ci), ref_c.imag, atol=1e-5)

        # inverse: pad to half, irfft (which ignores DC/Nyquist imag)
        half = n // 2 + 1
        spec = np.zeros((4, half), complex)
        spec[:, :kept] = ref_c
        ref_y = np.fft.irfft(spec, n=n, axis=-1) * n
        y = rdft_scatter_last(cr, ci, n, "forward")
        np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-4)

    def test_rdft_scatter_ignores_dc_nyquist_imag(self):
        from neuraloperator_tpu.ops.fourier import rdft_scatter_last

        n, kept = 8, 5  # kept-1 == n//2: Nyquist present
        rng = np.random.RandomState(3)
        cr = jnp.asarray(rng.randn(2, kept), jnp.float32)
        ci = jnp.asarray(rng.randn(2, kept), jnp.float32)
        y1 = rdft_scatter_last(cr, ci, n, "forward")
        ci2 = ci.at[:, 0].set(0.0).at[:, -1].set(0.0)
        y2 = rdft_scatter_last(cr, ci2, n, "forward")
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
