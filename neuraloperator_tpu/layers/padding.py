"""Domain padding for non-periodic inputs.

Equivalent of reference ``neuralop/layers/padding.py``: symmetric constant
padding by a fraction of the resolution. Stateless — shapes are static under
jit, so pad amounts are computed at trace time (the reference caches them in
dicts keyed by resolution string).
"""

from typing import List, Sequence, Union

import jax.numpy as jnp

from ..utils import validate_scaling_factor


class DomainPadding:
    """Symmetric fraction-of-resolution padding (channels-first layout)."""

    def __init__(
        self,
        domain_padding: Union[float, Sequence[float]],
        resolution_scaling_factor: Union[int, float, Sequence[float], None] = 1,
    ):
        self.domain_padding = domain_padding
        if resolution_scaling_factor is None:
            resolution_scaling_factor = 1
        self.resolution_scaling_factor = resolution_scaling_factor

    def _amounts(self, resolution: Sequence[int]) -> List[int]:
        dp = self.domain_padding
        if isinstance(dp, (float, int)):
            dp = [float(dp)] * len(resolution)
        assert len(dp) == len(resolution), (
            "domain_padding length must match the number of spatial dims"
        )
        return [round(p * r) for p, r in zip(dp, resolution)]

    def _scaling(self, n_dim: int) -> List[float]:
        rsf = self.resolution_scaling_factor
        if isinstance(rsf, (list, tuple)):
            return [float(s) for s in rsf]
        return validate_scaling_factor(rsf, n_dim, n_layers=None)

    def pad(self, x: jnp.ndarray) -> jnp.ndarray:
        resolution = x.shape[2:]
        padding = self._amounts(resolution)
        cfg = [(0, 0), (0, 0)] + [(p, p) for p in padding]
        return jnp.pad(x, cfg, mode="constant")

    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        """Remove padding, accounting for any resolution scaling applied since.

        Output-side pad amounts are the input-side amounts scaled by
        ``resolution_scaling_factor`` (reference padding.py:86-112).
        """
        out_res = x.shape[2:]
        n_dim = len(out_res)
        scaling = self._scaling(n_dim)
        # recover the input resolution r from: out = round(scale*(r + 2*round(p*r)))
        # Shapes are static, so solve numerically per dim.
        dp = self.domain_padding
        if isinstance(dp, (float, int)):
            dp = [float(dp)] * n_dim
        idx = [slice(None), slice(None)]
        for o, s, p_frac in zip(out_res, scaling, dp):
            pad_out = None
            for r in range(1, o + 1):
                p_in = round(p_frac * r)
                if round(s * (r + 2 * p_in)) == o:
                    pad_out = round(s * p_in)
                    break
            if pad_out is None:  # fall back: proportional estimate
                r_est = max(1, int(round(o / s / (1 + 2 * p_frac))))
                pad_out = round(s * round(p_frac * r_est))
            idx.append(slice(pad_out or None, -pad_out if pad_out else None))
        return x[tuple(idx)]

    __call__ = pad
