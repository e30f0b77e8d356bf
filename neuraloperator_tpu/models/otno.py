"""OTNO: Optimal Transport Neural Operator.

Equivalent of reference ``neuralop/models/otno.py``: an FNO whose inputs are
OT-transported source-mesh features on a square latent grid; the output is
decoded back to the target mesh by an index gather (``ind_dec``). The OT
plan itself is computed offline by the data pipeline (see
``data/datasets/ot_datamodule``).
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from .base_model import register_model
from .fno import FNO

Number = Union[int, float]


@register_model(name="OTNO")
class OTNO(FNO):
    """FNO with OT encode/decode (reference otno.py:29-111)."""

    # dataclass inheritance: every field after the first defaulted one needs
    # a default, so hidden_channels gets the reference's typical value
    in_channels: int = 4
    out_channels: int = 1
    hidden_channels: int = 64
    positional_embedding: Union[str, None] = None
    use_channel_mlp: bool = False
    channel_mlp_expansion: float = 0.5
    norm: Optional[str] = "group_norm"

    def __call__(self, x: jnp.ndarray, ind_dec: jnp.ndarray, **kwargs):
        """x: (1, in_channels, n_s_sqrt, n_s_sqrt) transported features;
        ind_dec: (n_t,) latent->target gather indices.
        Returns (out_channels, n_t)."""
        embedding = self._embedding()
        if embedding is not None:
            x = embedding(x)
        x = self.lifting(x)
        dp = self._domain_padding()
        if dp is not None:
            x = dp.pad(x)
        for i in range(self.n_layers):
            x = self.fno_blocks(x, i)
        if dp is not None:
            x = dp.unpad(x)
        # transport back to the target mesh: gather latent grid points
        h = x.reshape(self.hidden_channels, -1).T  # (n_s, hidden)
        out = h[ind_dec].T[None]  # (1, hidden, n_t)
        out = self.projection(out)
        return out[0]  # (out_channels, n_t)
