"""DISCO: discrete-continuous convolutions.

Equivalent of reference ``neuralop/layers/discrete_continuous_convolution.py``
(which delegates basis construction to torch_harmonics): a local integral
operator whose kernel is a learned combination of fixed filter-basis
functions, discretized on the grid.

TPU-native design: for equidistant grids the basis filters are precomputed
host-side as dense stencils ``psi (K, ks, ks)``; the runtime kernel is
``einsum('gok,kxy->goxy', w, psi)`` followed by one grouped convolution —
all MXU work. For fully unstructured grids the (quadrature-weighted) basis
matrix ``psi (K, n_out, n_in)`` is precomputed dense and applied as a
matmul.

Basis: piecewise-linear "hat" functions on the disk of the cutoff radius —
isotropic rings for ``kernel_shape=[nr]``, center + rings x angular hats for
``kernel_shape=[nr, nphi]`` (same family as torch_harmonics's default
piecewise-linear basis).
"""

import functools
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def _hat(x: np.ndarray, center: float, width: float) -> np.ndarray:
    return np.clip(1.0 - np.abs(x - center) / width, 0.0, None)


def _periodic_hat(phi: np.ndarray, center: float, width: float) -> np.ndarray:
    d = np.abs(np.angle(np.exp(1j * (phi - center))))
    return np.clip(1.0 - d / width, 0.0, None)


def num_basis_functions(kernel_shape: Sequence[int], basis_type: str = "piecewise_linear") -> int:
    if basis_type == "zernike":
        n = kernel_shape[0]
        return (n + 1) * (n + 2) // 2
    if basis_type == "morlet":
        nr = kernel_shape[0]
        nphi = kernel_shape[1] if len(kernel_shape) == 2 else 1
        return nr * nphi
    if len(kernel_shape) == 1:
        return kernel_shape[0]
    nr, nphi = kernel_shape
    return 1 + (nr - 1) * nphi


def _morlet(r, phi, k_r, k_phi):
    """Real Morlet-style wavelet on the disk (torch_harmonics 'morlet')."""
    envelope = np.exp(-0.5 * (3.0 * r) ** 2)
    return envelope * np.cos(np.pi * (k_r * r * np.cos(phi) + k_phi * r * np.sin(phi)))


def _zernike(r, phi, n, m):
    """Zernike polynomial Z_n^m on the unit disk."""
    from math import factorial

    R = np.zeros_like(r)
    mm = abs(m)
    for k in range((n - mm) // 2 + 1):
        c = ((-1) ** k * factorial(n - k)) / (
            factorial(k)
            * factorial((n + mm) // 2 - k)
            * factorial((n - mm) // 2 - k)
        )
        R = R + c * r ** (n - 2 * k)
    if m >= 0:
        return R * np.cos(mm * phi)
    return R * np.sin(mm * phi)


@functools.lru_cache(maxsize=64)
def equidistant_filter_basis(
    kernel_shape: Tuple[int, ...], kernel_size: int,
    basis_type: str = "piecewise_linear",
) -> np.ndarray:
    """psi (K, ks, ks): basis stencils on an odd-size square support.

    Each basis function is normalized to unit integral over the stencil
    (mirrors reference ``_normalize_convolution_filter_matrix``,
    discrete_continuous_convolution.py:31-83).
    """
    ks = kernel_size
    assert ks % 2 == 1, "kernel_size must be odd"
    half = ks // 2
    xs = np.arange(-half, half + 1) / max(half, 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2)
    phi = np.arctan2(Y, X)

    if basis_type == "morlet":
        nr, nphi = (kernel_shape if len(kernel_shape) == 2 else (kernel_shape[0], 1))
        funcs = [
            _morlet(r, phi, k_r, k_phi)
            for k_r in range(nr)
            for k_phi in range(nphi)
        ]
        psi = np.stack(funcs)
    elif basis_type == "zernike":
        n_max = kernel_shape[0]
        funcs = [
            _zernike(np.clip(r, 0, 1), phi, n, m)
            for n in range(n_max + 1)
            for m in range(-n, n + 1, 2)
        ]
        psi = np.stack(funcs)
    elif len(kernel_shape) == 1:
        nr = kernel_shape[0]
        radii = np.linspace(0, 1, nr)
        width = 1.0 / max(nr - 1, 1)
        psi = np.stack([_hat(r, c, width) for c in radii])
    else:
        nr, nphi = kernel_shape
        radii = np.linspace(0, 1, nr)
        rwidth = 1.0 / max(nr - 1, 1)
        pwidth = 2 * np.pi / nphi
        funcs = [_hat(r, 0.0, rwidth)]  # center
        for i in range(1, nr):
            for j in range(nphi):
                c_phi = 2 * np.pi * j / nphi - np.pi
                funcs.append(
                    _hat(r, radii[i], rwidth) * _periodic_hat(phi, c_phi, pwidth)
                )
        psi = np.stack(funcs)
    psi = np.where(r[None] <= 1.0, psi, 0.0)
    norms = np.abs(psi).sum(axis=(1, 2), keepdims=True)
    psi = psi / np.maximum(norms, 1e-12)
    return psi.astype(np.float32)


class EquidistantDiscreteContinuousConv2d(nn.Module):
    """DISCO conv on an equidistant 2-D grid (reference :682-858).

    The continuous kernel is sampled on a (kernel_size x kernel_size)
    stencil; groups follow the grouped-weight layout
    (out_channels, in_channels/groups, K).
    """

    in_channels: int
    out_channels: int
    kernel_shape: Tuple[int, ...] = (2,)
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"
    basis_type: str = "piecewise_linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = num_basis_functions(tuple(self.kernel_shape), self.basis_type)
        psi = jnp.asarray(
            equidistant_filter_basis(
                tuple(self.kernel_shape), self.kernel_size, self.basis_type
            )
        )
        scale = math.sqrt(2.0 / (self.in_channels * K))
        w = self.param(
            "weight",
            lambda key: scale
            * nn.initializers.normal(1.0)(
                key,
                (self.out_channels, self.in_channels // self.groups, K),
            ),
        )
        kernel = jnp.einsum("oik,kxy->oixy", w, psi)
        pad = self.kernel_size // 2
        cfg = [(0, 0), (0, 0), (pad, pad), (pad, pad)]
        if self.padding_mode == "periodic":
            xp = jnp.pad(x, cfg, mode="wrap")
        else:
            xp = jnp.pad(x, cfg)
        dn = lax.conv_dimension_numbers(
            xp.shape, kernel.shape, ("NCHW", "OIHW", "NCHW")
        )
        y = lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None, None]
        return y


class EquidistantDiscreteContinuousConvTranspose2d(nn.Module):
    """Transpose DISCO conv for upsampling (reference :858+)."""

    in_channels: int
    out_channels: int
    kernel_shape: Tuple[int, ...] = (2,)
    kernel_size: int = 3
    stride: int = 2
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = num_basis_functions(tuple(self.kernel_shape))
        psi = jnp.asarray(
            equidistant_filter_basis(tuple(self.kernel_shape), self.kernel_size)
        )
        scale = math.sqrt(2.0 / (self.in_channels * K))
        w = self.param(
            "weight",
            lambda key: scale
            * nn.initializers.normal(1.0)(
                key,
                (self.in_channels // self.groups, self.out_channels, K),
            ),
        )
        kernel = jnp.einsum("iok,kxy->ioxy", w, psi)
        y = lax.conv_transpose(
            x,
            kernel,
            strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NCHW", "IOHW", "NCHW"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None, None]
        return y


def _grouped_channel_mix(z, w, groups: int):
    """Grouped channel mixing for unstructured DISCO convs.

    z: (b, in_channels, K, m); w: (out_channels, in_channels // groups, K).
    Implements the reference's grouped einsum ``'bgckx,gock->bgox'``
    (discrete_continuous_convolution.py:465-472, :658-672).
    """
    b, c_in, K, m = z.shape
    o = w.shape[0]
    if groups == 1:
        return jnp.einsum("bikm,oik->bom", z, w)
    zg = z.reshape(b, groups, c_in // groups, K, m)
    wg = w.reshape(groups, o // groups, w.shape[1], K)
    y = jnp.einsum("bgckm,gock->bgom", zg, wg)
    return y.reshape(b, o, m)


class DiscreteContinuousConv2d(nn.Module):
    """DISCO conv between arbitrary point sets (reference :271-477).

    ``psi`` — the precomputed (K, n_out, n_in) filter matrix including
    quadrature weights — is passed at call time (host-precomputed with
    :func:`precompute_filter_matrix`); the forward is
    psi-matmul + grouped channel einsum, both MXU work.
    """

    in_channels: int
    out_channels: int
    kernel_shape: Tuple[int, ...] = (2,)
    groups: int = 1
    use_bias: bool = True
    basis_type: str = "piecewise_linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """x: (batch, in_channels, n_in); psi: (K, n_out, n_in)."""
        K = num_basis_functions(tuple(self.kernel_shape), self.basis_type)
        scale = math.sqrt(2.0 / (self.in_channels * K))
        w = self.param(
            "weight",
            lambda key: scale
            * nn.initializers.normal(1.0)(
                key, (self.out_channels, self.in_channels // self.groups, K)
            ),
        )
        # integrate the basis against the input: (b, c, K, n_out)
        z = jnp.einsum("bcn,kmn->bckm", x, psi)
        y = _grouped_channel_mix(z, w, self.groups)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None]
        return y


def _basis_funcs(r, phi, kernel_shape: Tuple[int, ...], basis_type: str):
    """Evaluate all basis functions at normalized radius/angle arrays."""
    if basis_type == "morlet":
        nr, nphi = (
            kernel_shape if len(kernel_shape) == 2 else (kernel_shape[0], 1)
        )
        return [
            _morlet(r, phi, k_r, k_phi)
            for k_r in range(nr)
            for k_phi in range(nphi)
        ]
    if basis_type == "zernike":
        n_max = kernel_shape[0]
        return [
            _zernike(np.clip(r, 0, 1), phi, n, m)
            for n in range(n_max + 1)
            for m in range(-n, n + 1, 2)
        ]
    if len(kernel_shape) == 1:
        nr = kernel_shape[0]
        radii = np.linspace(0, 1, nr)
        width = 1.0 / max(nr - 1, 1)
        return [_hat(r, c, width) for c in radii]
    nr, nphi = kernel_shape
    radii = np.linspace(0, 1, nr)
    rwidth = 1.0 / max(nr - 1, 1)
    pwidth = 2 * np.pi / nphi
    funcs = [_hat(r, 0.0, rwidth)]  # center
    for i in range(1, nr):
        for j in range(nphi):
            c_phi = 2 * np.pi * j / nphi - np.pi
            funcs.append(
                _hat(r, radii[i], rwidth) * _periodic_hat(phi, c_phi, pwidth)
            )
    return funcs


def precompute_filter_matrix(
    in_coords: np.ndarray,
    out_coords: np.ndarray,
    kernel_shape: Sequence[int],
    radius_cutoff: float,
    quadrature_weights: Optional[np.ndarray] = None,
    basis_type: str = "piecewise_linear",
    periodic: bool = False,
    transpose: bool = False,
    normalize: bool = True,
) -> np.ndarray:
    """Host precompute of psi (K, n_out, n_in) for unstructured DISCO.

    Mirrors reference ``_precompute_convolution_filter_matrix`` +
    ``_normalize_convolution_filter_matrix``
    (discrete_continuous_convolution.py:31-186): evaluate each basis
    function at the offsets between output and input points, normalize each
    basis function's quadrature-weighted integral PER OUTPUT POINT, and fold
    the input quadrature weights in (the reference multiplies x by them at
    forward time, :452-455).

    ``transpose=True`` builds the transpose-convolution filter (reference
    ``DiscreteContinuousConvTranspose2d``, :479-681): the basis is evaluated
    at the reversed offsets ``x_in - y_out`` (scattering input values onto
    output points) with the reference's ``transpose_normalization``, which
    reduces to the same per-(k, output-point) normalization in the dense
    layout.
    """
    n_in = len(in_coords)
    if quadrature_weights is None:
        quadrature_weights = np.full(n_in, 1.0 / n_in)
    diff = out_coords[:, None, :] - in_coords[None, :, :]
    if transpose:
        diff = -diff
    if periodic:
        # wrap to the nearest image on the unit torus (reference :158-160)
        alt = np.where(diff > 0.0, diff - 1.0, diff + 1.0)
        diff = np.where(np.abs(diff) < np.abs(alt), diff, alt)
    r = np.linalg.norm(diff, axis=-1) / radius_cutoff
    phi = np.arctan2(diff[..., 1], diff[..., 0])

    psi = np.stack(
        _basis_funcs(r, phi, tuple(kernel_shape), basis_type)
    )  # (K, n_out, n_in)
    psi = np.where(r[None] <= 1.0, psi, 0.0)
    psi = psi * quadrature_weights[None, None, :]
    if normalize:
        # per-(basis, output-point) discrete-integral normalization. The
        # reference divides by the SIGNED integral (+eps) — exact for the
        # non-negative piecewise-linear basis; for the signed Morlet/
        # Zernike bases (whose signed integrals can vanish) we normalize
        # by the absolute integral instead, a numerically sane deviation
        if basis_type == "piecewise_linear":
            norms = psi.sum(axis=2, keepdims=True)
            psi = psi / (norms + 1e-9)
        else:
            norms = np.abs(psi).sum(axis=2, keepdims=True)
            psi = psi / np.maximum(norms, 1e-9)
    return psi.astype(np.float32)


class DiscreteContinuousConvTranspose2d(nn.Module):
    """Transpose DISCO conv between arbitrary point sets.

    Counterpart of reference ``DiscreteContinuousConvTranspose2d``
    (``/root/reference/neuralop/layers/discrete_continuous_convolution.py:479-681``):
    scatters input-point values onto output points through the transposed
    filter matrix. ``psi`` — (K, n_out, n_in), host-precomputed with
    :func:`precompute_filter_matrix(..., transpose=True)` — is passed at
    call time; the forward is one psi matmul + one grouped channel einsum,
    both MXU work (the reference uses a sparse mm; dense static shapes are
    the TPU-native layout).
    """

    in_channels: int
    out_channels: int
    kernel_shape: Tuple[int, ...] = (2,)
    groups: int = 1
    use_bias: bool = True
    basis_type: str = "piecewise_linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """x: (batch, in_channels, n_in); psi: (K, n_out, n_in)."""
        K = num_basis_functions(tuple(self.kernel_shape), self.basis_type)
        scale = math.sqrt(2.0 / (self.in_channels * K))
        w = self.param(
            "weight",
            lambda key: scale
            * nn.initializers.normal(1.0)(
                key, (self.out_channels, self.in_channels // self.groups, K)
            ),
        )
        # scatter input values through the transposed filter: (b, c, K, n_out)
        z = jnp.einsum("bcn,kmn->bckm", x, psi)
        # grouped channel mixing (reference einsum 'bgckx,gock->bgox', :665)
        y = _grouped_channel_mix(z, w, self.groups)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None]
        return y
