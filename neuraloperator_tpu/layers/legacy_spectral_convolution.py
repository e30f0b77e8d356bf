"""Legacy (v1) spectral convolutions, kept for back-compatibility.

Equivalent of reference ``neuralop/layers/legacy_spectral_convolution.py``:
corner-mode (non-fftshifted) slicing, optional *joint factorization* (one
factorized tensor parameterizing all layers, viewed per-layer via
``SubConv``), and the hand-specialized ``SpectralConv1d/2d/3d`` classes.

Everything runs through the same split-real contraction machinery as the
modern path, so it is equally TPU-runtime-safe.
"""

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.complex_einsum import complex_einsum
from ..tensor.factorized import factor_shapes, init_factors, resolve_spec, to_tensor
from .spectral_convolution import to_complex, to_real_storage

Number = Union[int, float]


class SpectralConv1d(nn.Module):
    """Legacy 1-D spectral conv with corner modes (reference :573-609)."""

    in_channels: int
    out_channels: int
    n_modes: int  # half-modes kept (already halved semantics)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        modes = self.n_modes
        std = (2 / (self.in_channels + self.out_channels)) ** 0.5

        def init(key):
            kr, ki = jax.random.split(key)
            shape = (self.in_channels, self.out_channels, modes)
            return std * jax.random.normal(kr, (2,) + shape)

        w = to_complex(self.param("weight", init))
        n = x.shape[-1]
        xf = jnp.fft.rfft(x.astype(jnp.float32), axis=-1, norm="forward")
        kept = min(modes, xf.shape[-1])
        out = complex_einsum(
            "bix,iox->box", xf[..., :kept], w[..., :kept]
        )
        pad = [(0, 0)] * (out.ndim - 1) + [(0, xf.shape[-1] - kept)]
        out = jnp.pad(out, pad)
        return jnp.fft.irfft(out, n=n, axis=-1, norm="forward")


class SpectralConv2d(nn.Module):
    """Legacy 2-D spectral conv: two corner blocks (reference :610-665)."""

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        m1, m2 = self.n_modes
        std = (2 / (self.in_channels + self.out_channels)) ** 0.5

        def init(key):
            shape = (2, self.in_channels, self.out_channels, m1, m2)
            return std * jax.random.normal(key, (2,) + shape)

        w = to_complex(self.param("weight", init))  # (2, i, o, m1, m2)
        h, width = x.shape[-2:]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), norm="forward")
        half = xf.shape[-1]
        k2 = min(m2, half)
        top = complex_einsum(
            "bixy,ioxy->boxy", xf[..., :m1, :k2], w[0][..., :k2]
        )
        bot = complex_einsum(
            "bixy,ioxy->boxy", xf[..., -m1:, :k2], w[1][..., :k2]
        )
        zero_rows = h - 2 * m1

        def assemble(p):
            mid = jnp.zeros(
                p(top).shape[:-2] + (zero_rows, k2), p(top).dtype
            )
            col = jnp.concatenate([p(top), mid, p(bot)], axis=-2)
            return jnp.pad(
                col, [(0, 0)] * (col.ndim - 1) + [(0, half - k2)]
            )

        re = assemble(jnp.real)
        im = assemble(jnp.imag)
        return jnp.fft.irfft2(
            jax.lax.complex(re, im), s=(h, width), norm="forward"
        )


class SpectralConv3d(nn.Module):
    """Legacy 3-D spectral conv: four corner blocks (reference :666-742)."""

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        m1, m2, m3 = self.n_modes
        std = (2 / (self.in_channels + self.out_channels)) ** 0.5

        def init(key):
            shape = (4, self.in_channels, self.out_channels, m1, m2, m3)
            return std * jax.random.normal(key, (2,) + shape)

        w = to_complex(self.param("weight", init))
        d1, d2, d3 = x.shape[-3:]
        xf = jnp.fft.rfftn(x.astype(jnp.float32), axes=(-3, -2, -1), norm="forward")
        half = xf.shape[-1]
        k3 = min(m3, half)
        corners = [
            (slice(None), slice(None), slice(0, m1), slice(0, m2)),
            (slice(None), slice(None), slice(-m1, None), slice(0, m2)),
            (slice(None), slice(None), slice(0, m1), slice(-m2, None)),
            (slice(None), slice(None), slice(-m1, None), slice(-m2, None)),
        ]
        outs = []
        for ci, sl in enumerate(corners):
            blk = xf[sl + (slice(0, k3),)]
            outs.append(
                complex_einsum("bixyz,ioxyz->boxyz", blk, w[ci][..., :k3])
            )

        def assemble(p):
            zeros_mid_x = jnp.zeros(
                p(outs[0]).shape[:-3] + (d1 - 2 * m1, m2, k3),
                p(outs[0]).dtype,
            )
            left = jnp.concatenate(
                [p(outs[0]), zeros_mid_x, p(outs[1])], axis=-3
            )
            right = jnp.concatenate(
                [p(outs[2]), zeros_mid_x, p(outs[3])], axis=-3
            )
            zeros_mid_y = jnp.zeros(
                left.shape[:-2] + (d2 - 2 * m2, k3), left.dtype
            )
            full = jnp.concatenate([left, zeros_mid_y, right], axis=-2)
            return jnp.pad(
                full, [(0, 0)] * (full.ndim - 1) + [(0, half - k3)]
            )

        spec = jax.lax.complex(assemble(jnp.real), assemble(jnp.imag))
        return jnp.fft.irfftn(
            spec, s=(d1, d2, d3), axes=(-3, -2, -1), norm="forward"
        )


class JointFactorizedSpectralConv(nn.Module):
    """All layers' weights as one factorized tensor (reference :196-248).

    Weight shape: (n_layers * n_corner_blocks, in, out, *half_modes); use
    ``get_conv(i)``-style indexing via the ``layer_index`` call argument.
    """

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, ...]
    n_layers: int = 1
    factorization: Optional[str] = "tucker"
    rank: Union[float, Tuple[int, ...]] = 0.5
    implementation: str = "reconstructed"
    use_bias: bool = True

    @property
    def order(self):
        return len(self.n_modes)

    @property
    def half_modes(self):
        hm = list(self.n_modes)
        hm[-1] = hm[-1] // 2 + 1
        # corner blocks double every dim except the rfft'd last one
        n_blocks = 2 ** (self.order - 1)
        return hm, n_blocks

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer_index: int = 0) -> jnp.ndarray:
        hm, n_blocks = self.half_modes
        shape = (
            self.n_layers * n_blocks,
            self.in_channels,
            self.out_channels,
            *hm,
        )
        spec = resolve_spec(self.factorization, shape, self.rank)
        std = (2 / (self.in_channels + self.out_channels)) ** 0.5
        params = {}
        for name in factor_shapes(spec):
            def initializer(key, name=name):
                return to_real_storage(init_factors(key, spec, std)[name])

            params[name] = to_complex(self.param(f"w_{name}", initializer))
        weight = to_tensor(spec, params)  # (L*B, i, o, *hm)

        if self.order == 1:
            w = weight[layer_index * n_blocks]
            n = x.shape[-1]
            xf = jnp.fft.rfft(x.astype(jnp.float32), axis=-1, norm="forward")
            kept = min(hm[0], xf.shape[-1])
            out = complex_einsum("bix,iox->box", xf[..., :kept], w[..., :kept])
            out = jnp.pad(
                out, [(0, 0)] * (out.ndim - 1) + [(0, xf.shape[-1] - kept)]
            )
            y = jnp.fft.irfft(out, n=n, axis=-1, norm="forward")
        elif self.order == 2:
            m1, k2 = hm
            h, width = x.shape[-2:]
            xf = jnp.fft.rfft2(x.astype(jnp.float32), norm="forward")
            half = xf.shape[-1]
            k2 = min(k2, half)
            w0 = weight[layer_index * n_blocks]
            w1 = weight[layer_index * n_blocks + 1]
            top = complex_einsum(
                "bixy,ioxy->boxy", xf[..., :m1, :k2], w0[..., :k2]
            )
            bot = complex_einsum(
                "bixy,ioxy->boxy", xf[..., -m1:, :k2], w1[..., :k2]
            )

            def assemble(p):
                mid = jnp.zeros(
                    p(top).shape[:-2] + (h - 2 * m1, k2), p(top).dtype
                )
                col = jnp.concatenate([p(top), mid, p(bot)], axis=-2)
                return jnp.pad(
                    col, [(0, 0)] * (col.ndim - 1) + [(0, half - k2)]
                )

            y = jnp.fft.irfft2(
                jax.lax.complex(assemble(jnp.real), assemble(jnp.imag)),
                s=(h, width),
                norm="forward",
            )
        else:
            raise NotImplementedError(
                "joint factorization shim supports 1-D and 2-D"
            )
        if self.use_bias:
            biases = self.param(
                "bias",
                lambda key: std
                * jax.random.normal(
                    key,
                    (self.n_layers, self.out_channels) + (1,) * self.order,
                ),
            )
            y = y + biases[layer_index][None]
        return y


class SubConv:
    """Per-layer view of a JointFactorizedSpectralConv (reference :532-570)."""

    def __init__(self, main_conv, indices: int):
        self.main_conv = main_conv
        self.indices = indices

    def __call__(self, x, **kwargs):
        return self.main_conv(x, layer_index=self.indices, **kwargs)
