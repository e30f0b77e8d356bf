"""Normalization layers: InstanceNorm, GroupNorm, AdaIN conditioning.

Counterpart of reference examples/layers/plot_normalization_layers.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp

from neuraloperator_tpu.layers.normalization_layers import (
    AdaIN,
    GroupNorm,
    InstanceNorm,
)

x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 16)) * 3 + 1

inorm = InstanceNorm()
y = inorm.apply(inorm.init(jax.random.PRNGKey(1), x), x)
print("InstanceNorm out mean/std:", float(y.mean()), float(y.std()))

gnorm = GroupNorm(num_groups=4, num_channels=8)
y = gnorm.apply(gnorm.init(jax.random.PRNGKey(1), x), x)
print("GroupNorm out:", y.shape)

ada = AdaIN(embed_dim=12, in_channels=8)
emb = jax.random.normal(jax.random.PRNGKey(2), (12,))
v = ada.init(jax.random.PRNGKey(3), x, emb)
print("AdaIN out:", ada.apply(v, x, emb).shape)
