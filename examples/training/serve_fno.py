"""Deploying a trained FNO: AOT buckets + a portable StableHLO artifact.

Shows the two serving paths in ``neuraloperator_tpu.serving``:

1. ``CompiledForward`` — compile a set of batch buckets ahead of time so
   every request (padded up to the nearest bucket) hits a pre-compiled
   TPU program; measure real per-request latency.
2. ``export_forward`` / ``load_exported`` — a single-file StableHLO
   artifact with the weights baked in and a *polymorphic* batch dim;
   the consumer needs neither the model class nor this package.

Runs anywhere (CPU in CI, TPU in production) — the artifact records the
lowering platform(s) it was built for.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.serving import (
    CompiledForward,
    export_forward,
    load_exported,
)

model = FNO(n_modes=(16, 16), in_channels=1, out_channels=1,
            hidden_channels=32, n_layers=4)
x = jnp.asarray(np.random.RandomState(0).randn(8, 1, 64, 64), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
# (in real use: params = training_state.load(...)["params"])

# --- path 1: AOT-compiled batch buckets -------------------------------
# In real use, bake the checkpoint's normalizers into the endpoint so
# requests flow raw-space in / raw-space out (scripts/serve_model.py
# wires these automatically from the data_processor.json sidecar):
#   dp = load_data_processor(ckpt_dir)
#   CompiledForward(..., preprocess_fn=dp.in_normalizer.transform,
#                   postprocess_fn=dp.out_normalizer.inverse_transform)
srv = CompiledForward(model, params, x, batch_sizes=(1, 8))
print("compile seconds per bucket:",
      {b: round(s, 2) for b, s in srv.compile_seconds.items()})
out = srv(x[:5])  # request of 5 -> padded to bucket 8, sliced back
print("request(5) ->", out.shape)
print("latency b=1: %.2f ms/request" % (srv.latency_probe(1) * 1e3))

# --- path 2: portable artifact ---------------------------------------
artifact = "/tmp/fno_forward.stablehlo"
blob = export_forward(model, params, x, path=artifact)
print("artifact size: %.1f MB" % (len(blob) / 1e6))

fn = load_exported(artifact)  # no model class / params needed past here
# jit the reference forward: restricted TPU runtimes cannot execute
# spectral convs op-by-op
ref = jax.jit(lambda p, a: model.apply({"params": p}, a))(params, x)
print("artifact max |err|:", float(jnp.abs(fn(x) - ref).max()))
print("polymorphic batch (3):", fn(x[:3]).shape)
