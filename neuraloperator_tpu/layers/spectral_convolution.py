"""Spectral convolution — the FNO hot path, TPU-native.

Behavioral equivalent of the reference ``SpectralConv``
(``/root/reference/neuralop/layers/spectral_convolution.py:183-570``):
N-D real/complex FFT -> centered mode truncation -> per-mode (possibly
factorized) complex channel contraction -> inverse FFT with explicit
Hermitian enforcement.

TPU-first differences from the reference implementation strategy:

* No ``fftshift``/``ifftshift`` rolls: the centered mode block of the
  spectrum is gathered/scattered as two static corner slices per axis
  (see ``ops/fourier.py``), which XLA fuses with the FFTs.
* Complex weights are *stored* as real arrays with a leading (2, ...) axis
  (real/imag stacked) so optimizers, checkpointing and mesh sharding all
  operate on real pytrees; they are viewed as complex inside the kernel.
* The contraction is a single einsum per layer, lowered onto the MXU.
* Resolution scaling is done by scattering modes directly into the
  target-size spectrum (alias-free), rather than end-padding the inverse
  FFT.
"""

from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.contractions import contract_block
from ..ops.fourier import (
    dft_gather_axis,
    dft_scatter_axis,
    gather_center_modes,
    rdft_gather_last,
    rdft_scatter_last,
    hermitianize_parts,
    kept_mode_counts,
    resolve_weight_slices,
    scatter_center_modes,
    scatter_low_modes_last,
)
from ..tensor.factorized import (
    FactorizationSpec,
    factor_shapes,
    init_factors,
    resolve_spec,
    slice_factors,
)
from ..utils import validate_scaling_factor
from .resample import resample

Number = Union[int, float]


def to_real_storage(c: jnp.ndarray) -> jnp.ndarray:
    """Stack a complex array into real storage of shape (2, ...)."""
    return jnp.stack([jnp.real(c), jnp.imag(c)])


def to_complex(storage: jnp.ndarray) -> jnp.ndarray:
    """View (2, ...) real storage as a complex array."""
    return jax.lax.complex(storage[0], storage[1])


def halve_last_mode(n_modes: Sequence[int], complex_data: bool) -> List[int]:
    """rfft redundancy: keep ``m//2 + 1`` modes along the last dim.

    Matches the reference ``n_modes`` setter
    (``spectral_convolution.py:404-415``).
    """
    n_modes = [int(m) for m in (
        [n_modes] if isinstance(n_modes, int) else list(n_modes)
    )]
    if not complex_data:
        n_modes[-1] = n_modes[-1] // 2 + 1
    return n_modes


class SpectralConv(nn.Module):
    """N-dimensional spectral convolution layer.

    Parameters mirror the reference class; see its docstring for full
    definitions. ``n_modes`` can be overridden per-call (static argument)
    for incremental-FNO mode growth — the active modes always index the
    center of the stored weight tensor.
    """

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, ...]
    complex_data: bool = False
    max_n_modes: Optional[Tuple[int, ...]] = None
    use_bias: bool = True
    separable: bool = False
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    fno_block_precision: str = "full"
    rank: Union[float, Tuple[int, ...]] = 1.0
    factorization: Optional[str] = None
    implementation: str = "reconstructed"
    enforce_hermitian_symmetry: bool = True
    fixed_rank_modes: bool = False
    init_std: Union[str, float] = "auto"
    fft_norm: str = "forward"
    weight_dtype: str = "float32"  # 'bfloat16' halves HBM weight traffic

    @property
    def order(self) -> int:
        n = self.n_modes
        return 1 if isinstance(n, int) else len(n)

    @property
    def halved_n_modes(self) -> List[int]:
        return halve_last_mode(self.n_modes, self.complex_data)

    @property
    def resolved_max_n_modes(self) -> List[int]:
        """Stored-weight mode extents.

        If ``max_n_modes`` is None the (already rfft-halved) ``n_modes`` are
        used; an explicit ``max_n_modes`` is taken verbatim, matching the
        reference (``spectral_convolution.py:317-321``).
        """
        if self.max_n_modes is None:
            return self.halved_n_modes
        m = self.max_n_modes
        return [int(m)] if isinstance(m, int) else [int(v) for v in m]

    @property
    def weight_shape(self) -> Tuple[int, ...]:
        if self.separable:
            if self.in_channels != self.out_channels:
                raise ValueError(
                    "separable SpectralConv requires in_channels == out_channels,"
                    f" got {self.in_channels} != {self.out_channels}"
                )
            return (self.in_channels, *self.resolved_max_n_modes)
        return (self.in_channels, self.out_channels, *self.resolved_max_n_modes)

    def spec(self) -> FactorizationSpec:
        fixed = [0] if (self.fixed_rank_modes is True) else (
            self.fixed_rank_modes or None
        )
        return resolve_spec(
            self.factorization, self.weight_shape, self.rank, fixed
        )

    def _init_std(self) -> float:
        if self.init_std == "auto":
            return (2 / (self.in_channels + self.out_channels)) ** 0.5
        return float(self.init_std)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        output_shape: Optional[Tuple[int, ...]] = None,
        n_modes: Optional[Tuple[int, ...]] = None,
    ) -> jnp.ndarray:
        """Apply the spectral convolution.

        x: (batch, in_channels, d1, ..., dN). Returns (batch, out_channels,
        o1, ..., oN) where the output resolution follows
        ``resolution_scaling_factor`` / ``output_shape``.
        """
        spec = self.spec()
        std = self._init_std()

        # Declare factor params (real storage, leading (2,) axis); viewed as
        # complex inside the kernel. Each factor gets its own RNG stream.
        shapes = factor_shapes(spec)
        if self.weight_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"weight_dtype must be 'float32' or 'bfloat16', got "
                f"{self.weight_dtype!r}"
            )
        storage_dtype = (
            jnp.bfloat16 if self.weight_dtype == "bfloat16" else jnp.float32
        )
        params = {}
        for name in shapes:
            def initializer(key, name=name):
                sub = init_factors(key, spec, std)
                return to_real_storage(sub[name]).astype(storage_dtype)

            w_st = self.param(f"w_{name}", initializer)
            # contraction runs split-real; bf16 storage upcasts on load (the
            # convert fuses into the matmul operand read)
            params[name] = to_complex(w_st.astype(jnp.float32))

        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key: std
                * jax.random.normal(
                    key, (self.out_channels,) + (1,) * self.order
                ),
            )

        return spectral_conv_forward(
            x,
            spec,
            params,
            bias=bias,
            n_modes=halve_last_mode(
                n_modes if n_modes is not None else self.n_modes,
                self.complex_data,
            ),
            max_n_modes=self.resolved_max_n_modes,
            complex_data=self.complex_data,
            separable=self.separable,
            implementation=self.implementation,
            fft_norm=self.fft_norm,
            fno_block_precision=self.fno_block_precision,
            enforce_hermitian_symmetry=self.enforce_hermitian_symmetry,
            resolution_scaling_factor=validate_scaling_factor(
                self.resolution_scaling_factor, self.order
            ),
            output_shape=output_shape,
            out_channels=self.out_channels,
        )

    def transform(
        self, x: jnp.ndarray, output_shape: Optional[Tuple[int, ...]] = None
    ) -> jnp.ndarray:
        """Resample a skip branch to this layer's output resolution.

        Mirrors reference ``SpectralConv.transform``
        (``spectral_convolution.py:383-398``).
        """
        in_shape = list(x.shape[2:])
        rsf = validate_scaling_factor(self.resolution_scaling_factor, self.order)
        if rsf is not None and output_shape is None:
            out_shape = tuple(round(s * r) for s, r in zip(in_shape, rsf))
        elif output_shape is not None:
            out_shape = tuple(output_shape)
        else:
            out_shape = tuple(in_shape)
        if tuple(in_shape) == out_shape:
            return x
        return resample(x, 1.0, list(range(2, x.ndim)), output_shape=out_shape)


def _simulate_half_complex(z: jnp.ndarray) -> jnp.ndarray:
    """Round a complex64 array's parts through bfloat16.

    TPU stand-in for the reference's ``chalf`` mixed-precision mode: the
    contraction operates on reduced-precision mantissas while staying in the
    XLA complex pipeline.
    """
    return jax.lax.complex(
        z.real.astype(jnp.bfloat16).astype(jnp.float32),
        z.imag.astype(jnp.bfloat16).astype(jnp.float32),
    )


def spectral_conv_forward(
    x: jnp.ndarray,
    spec: FactorizationSpec,
    params,
    *,
    bias: Optional[jnp.ndarray],
    n_modes: Sequence[int],
    max_n_modes: Sequence[int],
    complex_data: bool,
    separable: bool,
    implementation: str,
    fft_norm: str,
    fno_block_precision: str,
    enforce_hermitian_symmetry: bool,
    resolution_scaling_factor,
    output_shape: Optional[Sequence[int]],
    out_channels: int,
) -> jnp.ndarray:
    """Functional core of the spectral convolution (jit/grad friendly)."""
    order = len(n_modes)
    batch, in_ch, *mode_sizes = x.shape
    assert len(mode_sizes) == order, (
        f"input has {len(mode_sizes)} spatial dims but n_modes has {order}"
    )

    fft_size = list(mode_sizes)
    if not complex_data:
        fft_size[-1] = fft_size[-1] // 2 + 1
    fft_axes = list(range(-order, 0))

    if fno_block_precision == "half":
        x = x.astype(jnp.bfloat16).astype(jnp.float32)

    # --- slice active modes out of the stored weight (centered) ---
    slices_w = resolve_weight_slices(
        fft_size, n_modes, max_n_modes, separable, complex_data
    )
    spec_s, params_s = slice_factors(spec, params, slices_w)
    w_mode_start = 1 if separable else 2
    kept = list(spec_s.shape[w_mode_start:])

    # The FFT is the only op allowed to touch complex dtypes; everything
    # between the transforms runs split-real so restrictive TPU runtimes
    # (no complex dot_general/roll/non-trailing-axis FFTs) never see a
    # complex HLO op beyond the transforms themselves.
    if complex_data:
        xf = jnp.fft.fftn(x, norm=fft_norm, axes=fft_axes)
        X = jnp.stack([jnp.real(xf), jnp.imag(xf)])
        if fno_block_precision in ("half", "mixed"):
            X = X.astype(jnp.bfloat16).astype(jnp.float32)
        block = gather_center_modes(X, kept, fft_axes)
        br, bi = block[0], block[1]
    else:
        # real path: the trailing-axis rfft + low-mode slice is a truncated
        # real-DFT matmul for moderate sizes (kept <= half << n makes the
        # matmul cheaper on the MXU than the FFT's HBM passes); every OTHER
        # axis' fft + centered gather is ONE truncated complex-DFT matmul.
        # Profiled on NS-128: the FFTs + gather/scatter slices were ~10 ms
        # of the 27 ms step.
        kept_last = min(kept[-1], fft_size[-1])
        # half/mixed: the spectrum is bf16-rounded anyway, so the transform
        # matmuls run with bf16 operands at DEFAULT precision (1 MXU pass);
        # full precision keeps f32 operands at HIGH (bf16x3 = f32-accurate)
        mixedish = fno_block_precision in ("half", "mixed")
        tprec = jax.lax.Precision.DEFAULT if mixedish else None
        xin = x.astype(jnp.bfloat16 if mixedish else jnp.float32)
        if mode_sizes[-1] <= 512:
            br, bi = rdft_gather_last(xin, kept_last, fft_norm, tprec)
        else:
            xf = jnp.fft.rfft(x.astype(jnp.float32), axis=-1, norm=fft_norm)
            br, bi = jnp.real(xf), jnp.imag(xf)
            idx = [slice(None)] * br.ndim
            idx[-1] = slice(0, kept_last)
            br, bi = br[tuple(idx)], bi[tuple(idx)]
            if mixedish:
                br, bi = br.astype(jnp.bfloat16), bi.astype(jnp.bfloat16)
        for i, ax in enumerate(fft_axes[:-1]):
            br, bi = dft_gather_axis(
                br, bi, min(kept[i], mode_sizes[i]), ax, fft_norm, tprec
            )
        if kept_last < kept[-1]:
            # weight wider than the spectrum: trim weight's last-mode factors
            trim = [slice(None)] * spec_s.order
            trim[-1] = slice(0, kept_last)
            spec_s, params_s = slice_factors(spec_s, params_s, trim)

    # --- contract on the MXU (split real/imag -> real matmuls) ---
    # half/mixed: bf16 operands, f32 accumulation — the MXU-native fast
    # path (reference runs the contraction in chalf under autocast,
    # spectral_convolution.py:436-459)
    out_r, out_i = contract_block(
        (br, bi),
        spec_s,
        params_s,
        separable=separable,
        implementation=implementation,
        return_parts=True,
        compute_dtype=(
            jnp.bfloat16 if fno_block_precision in ("half", "mixed") else None
        ),
    )

    # --- output resolution ---
    out_sizes = list(mode_sizes)
    if resolution_scaling_factor is not None and output_shape is None:
        out_sizes = [
            round(s * r) for s, r in zip(mode_sizes, resolution_scaling_factor)
        ]
    if output_shape is not None:
        out_sizes = list(output_shape)

    # --- scatter into the target spectrum and inverse transform ---
    if complex_data:
        OUT = jnp.stack([out_r, out_i])
        OUT = _shrink_centered(OUT, out_sizes, fft_axes)
        S = scatter_center_modes(OUT, out_sizes, fft_axes)
        y = jnp.fft.ifftn(
            jax.lax.complex(S[0], S[1]), axes=fft_axes, norm=fft_norm
        )
    else:
        # inverse of the truncated-DFT path: per earlier axis one
        # (n_out x kept) inverse-DFT matmul (== scatter + ifft), then the
        # reference's Hermitian enforcement — zero the imaginary part of
        # the DC (and even-size Nyquist) bins of the NOW-PHYSICAL earlier
        # axes (spectral_convolution.py:547-559) — then one trailing irfft.
        half = out_sizes[-1] // 2 + 1
        out_r = _shrink_centered(out_r, out_sizes[:-1], fft_axes[:-1])
        out_i = _shrink_centered(out_i, out_sizes[:-1], fft_axes[:-1])
        idx = [slice(None)] * out_r.ndim
        idx[-1] = slice(0, min(out_r.shape[-1], half))
        out_r, out_i = out_r[tuple(idx)], out_i[tuple(idx)]
        if fno_block_precision in ("half", "mixed"):
            out_r = out_r.astype(jnp.bfloat16)
            out_i = out_i.astype(jnp.bfloat16)
        tprec = (
            jax.lax.Precision.DEFAULT
            if fno_block_precision in ("half", "mixed")
            else None
        )
        for i, ax in enumerate(fft_axes[:-1]):
            out_r, out_i = dft_scatter_axis(
                out_r, out_i, out_sizes[i], ax, fft_norm, tprec
            )
        if out_sizes[-1] <= 512 and enforce_hermitian_symmetry:
            # truncated inverse-rfft matmul with structural Hermitian
            # enforcement (no pad, no complex op)
            y = rdft_scatter_last(
                out_r, out_i, out_sizes[-1], fft_norm, tprec
            )
        else:
            out_r = scatter_low_modes_last(
                out_r.astype(jnp.float32), half, axis=-1
            )
            out_i = scatter_low_modes_last(
                out_i.astype(jnp.float32), half, axis=-1
            )
            if enforce_hermitian_symmetry:
                out_i = out_i.at[..., 0].set(0.0)
                if out_sizes[-1] % 2 == 0:
                    out_i = out_i.at[..., half - 1].set(0.0)
            y = jnp.fft.irfft(
                jax.lax.complex(out_r, out_i),
                n=out_sizes[-1],
                axis=-1,
                norm=fft_norm,
            )

    if fno_block_precision in ("half", "mixed"):
        # keep the block's activations bf16: an f32 conv output would
        # promote every downstream skip/MLP matmul to f32 (3-pass) —
        # profiled as ~2 ms/step of silent promotion on the NS-128 bench
        y = y.astype(jnp.bfloat16)

    if bias is not None:
        # match the activation dtype: an f32 bias would silently promote
        # the bf16 mixed-precision output (and every downstream matmul)
        # back to f32
        y = y + bias[None].astype(y.dtype)
    return y


def _shrink_centered(
    block: jnp.ndarray, target_sizes: Sequence[int], axes: Sequence[int]
) -> jnp.ndarray:
    """Truncate a centered-order mode block so it fits the target spectrum."""
    for size, ax in zip(target_sizes, axes):
        kept = block.shape[ax]
        if kept <= size:
            continue
        neg = kept // 2
        new_neg, new_pos = size // 2, size // 2 + size % 2
        idx = [slice(None)] * block.ndim
        idx[ax] = slice(neg - new_neg, neg + new_pos)
        block = block[tuple(idx)]
    return block
