"""Counting FLOPs with XLA cost analysis.

Counterpart of reference examples/training/plot_count_flops.py (which
uses torchtnt): on TPU, XLA reports exact flop and byte counts for the
compiled program via ``count_flops``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.utils import count_flops, count_model_params

model = FNO(n_modes=(16, 16), in_channels=1, out_channels=1,
            hidden_channels=32, n_layers=4)
x = jnp.ones((1, 1, 64, 64))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]

fwd = count_flops(lambda p, xx: model.apply({"params": p}, xx), params, x)
print(f"params: {count_model_params(params):,}")
print(f"forward: {fwd['flops']:.3e} flops, {fwd['bytes_accessed']:.3e} bytes")

def loss(p, xx):
    return (model.apply({"params": p}, xx) ** 2).sum()

fb = count_flops(jax.value_and_grad(loss), params, x)
print(f"forward+backward: {fb['flops']:.3e} flops")

# FLOPs scale with resolution thanks to the FFT
x2 = jnp.ones((1, 1, 128, 128))
fwd2 = count_flops(lambda p, xx: model.apply({"params": p}, xx), params, x2)
print(f"forward @128^2: {fwd2['flops']:.3e} flops "
      f"({fwd2['flops'] / fwd['flops']:.1f}x the 64^2 cost)")
