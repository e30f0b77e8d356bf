"""Resolution resampling of gridded functions.

Equivalent of reference ``neuralop/layers/resample.py``: 1-D linear and 2-D
bicubic interpolation (``align_corners=True``) and spectral (Fourier)
resampling for >=3-D.

TPU-first design: spatial interpolation along an axis is a fixed linear map,
so we precompute the (static-shape) interpolation matrix in numpy at trace
time and apply it as a matmul on the MXU — faster than gather-based
interpolation on TPU and bit-exact w.r.t. ``align_corners=True`` semantics.
"""

import functools
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(n_in: int, n_out: int, kind: str) -> np.ndarray:
    """(n_out, n_in) interpolation matrix with align_corners=True sampling."""
    if n_out == 1 or n_in == 1:
        src = np.zeros(n_out)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    W = np.zeros((n_out, n_in), dtype=np.float32)
    if kind == "linear":
        i0 = np.clip(np.floor(src).astype(int), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        t = src - np.floor(src)
        for row in range(n_out):
            W[row, i0[row]] += 1.0 - t[row]
            W[row, i1[row]] += t[row]
        return W
    if kind == "cubic":
        # Keys cubic convolution kernel, a = -0.75 (torch's bicubic)
        a = -0.75

        def k(x):
            x = abs(x)
            if x <= 1:
                return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
            if x < 2:
                return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
            return 0.0

        for row in range(n_out):
            base = int(np.floor(src[row]))
            for tap in range(-1, 3):
                idx = base + tap
                w = k(src[row] - idx)
                W[row, int(np.clip(idx, 0, n_in - 1))] += w
        return W
    raise ValueError(f"unknown interpolation kind {kind}")


def _apply_axis_matrix(x: jnp.ndarray, W: np.ndarray, axis: int) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, -1)
    y = x @ jnp.asarray(W, dtype=x.dtype).T
    return jnp.moveaxis(y, -1, axis)


def resample(
    x: jnp.ndarray,
    res_scale: Union[float, Sequence[float]],
    axis: Union[int, Sequence[int], None],
    output_shape: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Resample ``x`` (batch, channels, d1..dN) along ``axis``.

    Matches reference semantics (``resample.py:7-71``): linear for 1 spatial
    dim, bicubic for 2, spectral low-mode copy for >=3.
    """
    if isinstance(res_scale, (float, int)):
        if axis is None:
            axis = list(range(2, x.ndim))
            res_scale = [res_scale] * len(axis)
        elif isinstance(axis, int):
            axis = [axis]
            res_scale = [res_scale]
        else:
            axis = list(axis)
            res_scale = [res_scale] * len(axis)
    else:
        axis = list(axis)
        assert len(res_scale) == len(axis), "res_scale and axis length mismatch"

    old_size = x.shape[-len(axis):]
    if output_shape is None:
        new_size = tuple(int(round(s * r)) for s, r in zip(old_size, res_scale))
    else:
        new_size = tuple(output_shape)

    if tuple(old_size) == new_size:
        return x

    if len(axis) == 1:
        return _apply_axis_matrix(
            x, _interp_matrix(old_size[0], new_size[0], "linear"), axis[0]
        )
    if len(axis) == 2:
        y = _apply_axis_matrix(
            x, _interp_matrix(old_size[0], new_size[0], "cubic"), axis[0]
        )
        return _apply_axis_matrix(
            y, _interp_matrix(old_size[1], new_size[1], "cubic"), axis[1]
        )
    return spectral_resample(x, new_size, axis)


def spectral_resample(
    x: jnp.ndarray, new_size: Sequence[int], axes: Sequence[int]
) -> jnp.ndarray:
    """Fourier-domain resampling: copy low modes into the target spectrum.

    Mirrors reference ``resample.py:54-71`` (corner low-mode copy, forward
    norm), expressed as static per-axis concatenates instead of scatter.
    """
    axes = list(axes)
    in_dtype = x.dtype
    X = jnp.fft.rfftn(x.astype(jnp.float32), norm="forward", axes=axes)
    new_fft = list(new_size)
    new_fft[-1] = new_fft[-1] // 2 + 1
    keep = [min(n, o) for n, o in zip(new_fft, X.shape[-len(axes):])]

    # non-last axes: keep first m//2 and last m//2 rows, zero middle
    for ax, (m, target) in zip(axes[:-1], zip(keep[:-1], new_fft[:-1])):
        half = m // 2
        idx_lo = [slice(None)] * X.ndim
        idx_hi = [slice(None)] * X.ndim
        idx_lo[ax] = slice(0, half)
        idx_hi[ax] = slice(X.shape[ax] - half, X.shape[ax])
        mid_shape = list(X.shape)
        mid_shape[ax] = target - 2 * half
        parts = [X[tuple(idx_lo)]]
        if mid_shape[ax] > 0:
            parts.append(jnp.zeros(mid_shape, dtype=X.dtype))
        if half > 0:
            parts.append(X[tuple(idx_hi)])
        X = jnp.concatenate(parts, axis=ax)
    # last axis: low rfft modes
    ax = axes[-1]
    idx = [slice(None)] * X.ndim
    idx[ax] = slice(0, keep[-1])
    X = X[tuple(idx)]
    if X.shape[ax] < new_fft[-1]:
        pad = [(0, 0)] * X.ndim
        pad[ax] = (0, new_fft[-1] - X.shape[ax])
        X = jnp.pad(X, pad)
    y = jnp.fft.irfftn(X, s=new_size, norm="forward", axes=axes)
    return y.astype(in_dtype)


def iterative_resample(x, res_scale, axis):
    """Per-axis sequential resampling (reference ``resample.py:74-102``)."""
    if isinstance(axis, list) and isinstance(res_scale, (float, int)):
        res_scale = [res_scale] * len(axis)
    if isinstance(axis, list):
        for rs, a in zip(res_scale, axis):
            x = resample(x, rs, a)
        return x
    return resample(x, res_scale, axis)
