"""Spherical convolution (SFNO core layer).

Equivalent of reference ``neuralop/layers/spherical_convolution.py:284-485``:
SHT -> per-degree (dhconv) complex channel contraction -> inverse SHT at the
output resolution/grid. The SHT itself is the MXU-friendly Legendre-matmul
implementation in ``ops/sht.py`` (replaces torch_harmonics).
"""

from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.complex_einsum import complex_einsum
from ..ops.sht import isht, sht
from ..tensor.factorized import (
    factor_shapes,
    init_factors,
    resolve_spec,
    slice_factors,
    to_tensor,
)
from ..utils import validate_scaling_factor
from .spectral_convolution import to_complex, to_real_storage

Number = Union[int, float]


def contract_dhconv(x: jnp.ndarray, weight: jnp.ndarray, separable=False):
    """Driscoll-Healy style contraction: weight depends on degree l only.

    x: (b, i, l, m) complex; weight: (i, o, l) [or (i, l) separable].
    Mirrors reference ``_contract_dense(..., dhconv=True)``
    (spherical_convolution.py:20-44).
    """
    if separable:
        return complex_einsum("bilm,il->bilm", x, weight)
    return complex_einsum("bilm,iol->bolm", x, weight)


def contract_dhconv_factorized(x, spec, params, separable=False):
    """dhconv directly against CP/Tucker/TT factors (no reconstruction).

    Factorized analogue of reference ``_contract_cp/tucker/tt`` with
    dhconv=True (spherical_convolution.py:47-200): the weight's mode index
    is the degree l shared across orders m.
    """
    factors = [params[f"factor_{i}"] for i in range(spec.order)]
    if spec.kind == "cp":
        if separable:
            eq = "bilm,r,ir,lr->bilm"
        else:
            eq = "bilm,r,ir,or,lr->bolm"
        return complex_einsum(eq, x, params["lambdas"], *factors)
    if spec.kind == "tucker":
        if separable:
            eq = "bilm,pq,ip,lq->bilm"
        else:
            eq = "bilm,pqs,ip,oq,ls->bolm"
        return complex_einsum(eq, x, params["core"], *factors)
    if spec.kind == "tt":
        # rank symbols must not collide with the batch symbol 'b'
        if separable:
            eq = "bilm,xiy,ylz->bilm"
        else:
            eq = "bilm,xiy,yoz,zlw->bolm"
        return complex_einsum(eq, x, *factors)
    return contract_dhconv(x, to_tensor(spec, params), separable=separable)


class SphericalConv(nn.Module):
    """See reference SphericalConv docstring for parameters.

    ``n_modes`` = (lmax, mmax-ish): the weight has ``n_modes[0]`` degree
    entries; the SHT keeps ``n_modes[1] // 2`` orders (reference
    spherical_convolution.py:451-463).
    """

    in_channels: int
    out_channels: int
    n_modes: Tuple[int, ...]
    max_n_modes: Optional[Tuple[int, ...]] = None
    use_bias: bool = True
    separable: bool = False
    resolution_scaling_factor: Union[None, Number, Tuple[Number, ...]] = None
    fno_block_precision: str = "full"
    rank: Union[float, Tuple[int, ...]] = 0.5
    factorization: Optional[str] = "cp"
    implementation: str = "reconstructed"
    fixed_rank_modes: bool = False
    init_std: Union[str, float] = "auto"
    sht_norm: str = "ortho"
    sht_grids: Union[str, Tuple[str, ...]] = "equiangular"
    complex_data: bool = False  # unused; API parity with SpectralConv
    enforce_hermitian_symmetry: bool = True  # unused; API parity

    @property
    def order(self) -> int:
        return len(self.n_modes)

    @property
    def resolved_max_n_modes(self) -> List[int]:
        if self.max_n_modes is None:
            return list(self.n_modes)
        m = self.max_n_modes
        return [int(m)] if isinstance(m, int) else [int(v) for v in m]

    @property
    def grids(self) -> Tuple[str, str]:
        g = self.sht_grids
        return (g, g) if isinstance(g, str) else (g[0], g[1])

    @property
    def weight_shape(self):
        # weight indexed by degree l only (dhconv): modes[:-1] of n_modes
        if self.separable:
            if self.in_channels != self.out_channels:
                raise ValueError(
                    "separable SphericalConv requires in_channels == out_channels"
                )
            return (self.in_channels, *self.n_modes[:-1])
        return (self.in_channels, self.out_channels, *self.n_modes[:-1])

    def spec(self):
        fixed = [0] if (self.fixed_rank_modes is True) else None
        return resolve_spec(
            self.factorization, self.weight_shape, self.rank, fixed
        )

    def _init_std(self):
        if self.init_std == "auto":
            return (2 / (self.in_channels + self.out_channels)) ** 0.5
        return float(self.init_std)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        output_shape: Optional[Tuple[int, int]] = None,
        n_modes: Optional[Tuple[int, ...]] = None,
    ) -> jnp.ndarray:
        spec = self.spec()
        std = self._init_std()
        params = {}
        for name in factor_shapes(spec):
            def initializer(key, name=name):
                return to_real_storage(init_factors(key, spec, std)[name])

            params[name] = to_complex(self.param(f"w_{name}", initializer))

        modes = list(n_modes) if n_modes is not None else list(self.n_modes)
        batch, channels, height, width = x.shape
        rsf = validate_scaling_factor(self.resolution_scaling_factor, self.order)
        if rsf is not None and output_shape is None:
            height = round(height * rsf[0])
            width = round(width * rsf[1])
        elif output_shape is not None:
            height, width = output_shape

        grid_in, grid_out = self.grids
        lmax, mmax = modes[0], max(modes[1] // 2, 1)
        flm = sht(x, lmax=lmax, mmax=mmax, grid=grid_in, norm=self.sht_norm)

        # slice the weight's leading degree entries to the active modes
        w_slices = (
            [slice(None)] * (1 if self.separable else 2)
            + [slice(0, lmax)]
        )
        spec_s, params_s = slice_factors(spec, params, tuple(w_slices))
        if self.implementation == "factorized" and spec_s.kind != "dense":
            out_flm = contract_dhconv_factorized(
                flm, spec_s, params_s, separable=self.separable
            )
        else:
            weight = to_tensor(spec_s, params_s)
            out_flm = contract_dhconv(flm, weight, separable=self.separable)

        y = isht(
            out_flm, nlat=height, nlon=width, grid=grid_out, norm=self.sht_norm
        )

        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key: std
                * jax.random.normal(
                    key, (self.out_channels,) + (1,) * self.order
                ),
            )
            y = y + bias[None]
        return y

    def transform(
        self, x: jnp.ndarray, output_shape: Optional[Tuple[int, int]] = None
    ) -> jnp.ndarray:
        """Grid-to-grid resampling through the SHT (reference :408-428)."""
        in_h, in_w = x.shape[-2:]
        rsf = validate_scaling_factor(self.resolution_scaling_factor, self.order)
        if rsf is not None and output_shape is None:
            height, width = round(in_h * rsf[0]), round(in_w * rsf[1])
        elif output_shape is not None:
            height, width = output_shape
        else:
            height, width = in_h, in_w
        grid_in, grid_out = self.grids
        if (in_h, in_w) == (height, width) and grid_in == grid_out:
            return x
        flm = sht(
            x,
            lmax=self.n_modes[0],
            mmax=max(self.n_modes[1] // 2, 1),
            grid=grid_in,
            norm=self.sht_norm,
        )
        return isht(flm, nlat=height, nlon=width, grid=grid_out, norm=self.sht_norm)
