"""Attention-based kernel integral (linear attention over quadrature points).

Equivalent of reference ``neuralop/layers/attention_kernel_integral.py``:
k(x, y) = sum_c q_c(x) k_c(y); the integral against f = v becomes (with the
associative ordering) one K^T V contraction followed by a Q matmul — two
MXU matmuls regardless of the number of points. Supports self- and
cross-attention over point sets, instance-normalized k/v, diagonal-biased
xavier init, and rotary positional embeddings.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _diag_xavier_init(n_heads, head_ch, in_ch, gain):
    def init(key, shape, dtype=jnp.float32):
        # shape = (in_ch, n_heads * head_ch): per-head xavier + diagonal bias
        keys = jax.random.split(key, n_heads)
        cols = []
        for h in range(n_heads):
            limit = gain * math.sqrt(6.0 / (in_ch + head_ch))
            w = jax.random.uniform(
                keys[h], (in_ch, head_ch), dtype, -limit, limit
            )
            if head_ch == in_ch:
                w = w + gain * jnp.eye(in_ch, dtype=dtype)
            cols.append(w)
        return jnp.concatenate(cols, axis=1)

    return init


class AttentionKernelIntegral(nn.Module):
    """See reference AttentionKernelIntegral (attention_kernel_integral.py)."""

    in_channels: int
    out_channels: int
    n_heads: int
    head_n_channels: int
    project_query: bool = True

    def _norm_domain(self, u):
        """Instance norm over grid points per (batch, head, channel)."""
        mean = jnp.mean(u, axis=2, keepdims=True)
        var = jnp.var(u, axis=2, keepdims=True)
        return (u - mean) * jax.lax.rsqrt(var + 1e-5)

    @nn.compact
    def __call__(
        self,
        u_src: jnp.ndarray,
        pos_src: jnp.ndarray,
        positional_embedding_module=None,
        u_qry: Optional[jnp.ndarray] = None,
        pos_qry: Optional[jnp.ndarray] = None,
        weights: Optional[jnp.ndarray] = None,
        associative: bool = True,
        return_kernel: bool = False,
    ):
        if u_qry is None:
            if pos_qry is not None:
                raise ValueError(
                    "query coordinates given without a query function"
                )
            u_qry = u_src
        elif pos_qry is None:
            raise ValueError("query function given without query coordinates")
        if return_kernel and associative:
            raise ValueError("kernel matrix unavailable with associative=True")

        b, n_src = u_src.shape[:2]
        n_qry = u_qry.shape[1]
        gain = 1.0 / math.sqrt(self.head_n_channels)
        dim = self.n_heads * self.head_n_channels

        init = _diag_xavier_init(
            self.n_heads, self.head_n_channels, self.in_channels, gain
        )
        if self.project_query:
            wq = self.param("wq", init, (self.in_channels, dim))
            q = u_qry @ wq
        else:
            q = u_qry
        wk = self.param("wk", init, (self.in_channels, dim))
        wv = self.param("wv", init, (self.in_channels, dim))
        k = u_src @ wk
        v = u_src @ wv

        def heads(z, n):
            return jnp.transpose(
                z.reshape(b, n, self.n_heads, self.head_n_channels),
                (0, 2, 1, 3),
            )

        q = heads(q, n_qry)
        k = self._norm_domain(heads(k, n_src))
        v = self._norm_domain(heads(v, n_src))

        if positional_embedding_module is not None:
            pe = positional_embedding_module
            pos_dim = pos_src.shape[-1]
            pq = pos_src if pos_qry is None else pos_qry
            if pos_dim == 2:
                kf1 = pe(pos_src[..., 0])[:, None]
                kf2 = pe(pos_src[..., 1])[:, None]
                qf1 = pe(pq[..., 0])[:, None]
                qf2 = pe(pq[..., 1])[:, None]
                q = pe.apply_2d_rotary_pos_emb(q, qf1, qf2)
                k = pe.apply_2d_rotary_pos_emb(k, kf1, kf2)
            elif pos_dim == 1:
                kf = pe(pos_src[..., 0])[:, None]
                qf = pe(pq[..., 0])[:, None]
                q = pe.apply_1d_rotary_pos_emb(q, qf)
                k = pe.apply_1d_rotary_pos_emb(k, kf)
            else:
                raise ValueError("rotary embedding supports <= 2 dims")

        # quadrature weights multiply the source-point contributions; fold
        # them into v so both orderings stay correct for any (n_qry, n_src)
        if weights is not None:
            v = v * weights.reshape(b, 1, n_src, 1)
        else:
            v = v / n_src

        kxy = None
        if associative:
            dots = jnp.einsum("bhnc,bhnd->bhcd", k, v)
            u = jnp.einsum("bhmc,bhcd->bhmd", q, dots)
        else:
            kxy = jnp.einsum("bhmc,bhnc->bhmn", q, k)
            u = jnp.einsum("bhmn,bhnd->bhmd", kxy, v)

        u = jnp.transpose(u, (0, 2, 1, 3)).reshape(b, n_qry, dim)
        if dim != self.out_channels:
            u = nn.Dense(self.out_channels, name="to_out")(u)
        if return_kernel:
            return u, kxy
        return u
