"""AttentionKernelIntegral tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.layers.attention_kernel_integral import (
    AttentionKernelIntegral,
)
from neuraloperator_tpu.layers.embeddings import RotaryEmbedding2D


def test_self_attention_shapes():
    att = AttentionKernelIntegral(
        in_channels=8, out_channels=8, n_heads=2, head_n_channels=8
    )
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (2, 50, 2))
    variables = att.init(jax.random.PRNGKey(2), u, pos)
    out = att.apply(variables, u, pos)
    assert out.shape == (2, 50, 8)


def test_cross_attention_and_orderings_match():
    att = AttentionKernelIntegral(
        in_channels=4, out_channels=6, n_heads=1, head_n_channels=4
    )
    u_src = jax.random.normal(jax.random.PRNGKey(0), (1, 30, 4))
    pos_src = jax.random.uniform(jax.random.PRNGKey(1), (1, 30, 2))
    u_qry = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 4))
    pos_qry = jax.random.uniform(jax.random.PRNGKey(3), (1, 12, 2))
    variables = att.init(
        jax.random.PRNGKey(4), u_src, pos_src, u_qry=u_qry, pos_qry=pos_qry
    )
    out_assoc = att.apply(
        variables, u_src, pos_src, u_qry=u_qry, pos_qry=pos_qry,
        associative=True,
    )
    out_direct = att.apply(
        variables, u_src, pos_src, u_qry=u_qry, pos_qry=pos_qry,
        associative=False,
    )
    assert out_assoc.shape == (1, 12, 6)
    np.testing.assert_allclose(
        np.asarray(out_assoc), np.asarray(out_direct), rtol=1e-4, atol=1e-5
    )


def test_rotary_embedding_path():
    att = AttentionKernelIntegral(
        in_channels=8, out_channels=8, n_heads=2, head_n_channels=8
    )
    rot = RotaryEmbedding2D(dim=4)  # head_n_channels // 2 per spatial dim
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (2, 20, 2))
    variables = att.init(jax.random.PRNGKey(2), u, pos, rot)
    out = att.apply(variables, u, pos, rot)
    assert out.shape == (2, 20, 8)
