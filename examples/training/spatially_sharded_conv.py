"""Spatial model parallelism: sharded-FFT, sharded-SHT, sharded points.

Runs an FNO whose spectral layers shard the spatial height axis over the
mesh's 'model' axis (all_to_all over the truncated spectrum), the SFNO
latitude-sharded counterpart, and a GINO whose query points + padded
neighborhoods are sharded over the same axis — on a virtual 8-device CPU
mesh, so this example needs no TPU hardware. The same code runs
unchanged on a real multi-chip mesh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

try:
    on_multichip_tpu = (
        jax.default_backend() == "tpu" and len(jax.devices()) >= 8
    )
except Exception:  # axon relay / partial plugin environments
    on_multichip_tpu = False
if not on_multichip_tpu:
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jb

    _jb.clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from neuraloperator_tpu.models import FNO, SFNO
from neuraloperator_tpu.parallel import (
    DistributedSpectralConv2d,
    DistributedSphericalConv,
)
from neuraloperator_tpu.parallel import mesh as mesh_lib

mesh = mesh_lib.init(model_parallel_size=4)
print("mesh:", dict(mesh.shape))

# --- FNO with the height axis sharded through every spectral layer ---
model = FNO(
    n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=16,
    n_layers=2, conv_module=DistributedSpectralConv2d,
)
x = jnp.asarray(np.random.RandomState(0).randn(4, 1, 32, 32), jnp.float32)
with mesh_lib.use_mesh(mesh):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "model", None)))
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, xs)
print("sharded-FFT FNO out:", y.shape, "finite:", bool(jnp.isfinite(y).all()))

# --- SFNO with the latitude axis sharded (Legendre matmuls m-sharded) ---
sfno = SFNO(
    n_modes=(8, 8), in_channels=1, out_channels=1, hidden_channels=8,
    n_layers=2, conv_module=DistributedSphericalConv,
)
xs_sph = jnp.asarray(np.random.RandomState(1).randn(2, 1, 16, 32), jnp.float32)
with mesh_lib.use_mesh(mesh):
    sparams = jax.jit(sfno.init)(jax.random.PRNGKey(1), xs_sph)["params"]
    xsh = jax.device_put(
        xs_sph, NamedSharding(mesh, P(None, None, "model", None))
    )
    ys = jax.jit(lambda p, x: sfno.apply({"params": p}, x))(sparams, xsh)
print("sharded-SHT SFNO out:", ys.shape, "finite:", bool(jnp.isfinite(ys).all()))

# --- GINO with the query-point axis sharded (point-cloud family) ---
from neuraloperator_tpu.layers.neighbor_search import padded_neighbor_search
from neuraloperator_tpu.models import GINO
from neuraloperator_tpu.parallel import shard_gino_inputs

rng = np.random.RandomState(2)
input_geom = jnp.asarray(rng.rand(1, 48, 3), jnp.float32)
axes = [jnp.linspace(0, 1, 4)] * 3
latent_queries = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)[None]
output_queries = jnp.asarray(rng.rand(1, 16, 3), jnp.float32)
feats = jnp.asarray(rng.rand(2, 48, 4), jnp.float32)
lq_flat = latent_queries.reshape(-1, 3)
in_nbrs = padded_neighbor_search(input_geom[0], lq_flat, 0.4, 16)
out_nbrs = padded_neighbor_search(lq_flat, output_queries[0], 0.4, 16)

gino = GINO(
    in_channels=4, out_channels=1, gno_coord_dim=3, in_gno_radius=0.4,
    out_gno_radius=0.4, fno_in_channels=4, fno_n_modes=(4, 4, 4),
    fno_hidden_channels=8, fno_n_layers=1, gno_max_neighbors=16,
    in_gno_channel_mlp_hidden_layers=(16,),
    out_gno_channel_mlp_hidden_layers=(16,),
)
gkw = dict(in_neighbors=in_nbrs, out_neighbors=out_nbrs)
gp = jax.jit(gino.init)(jax.random.PRNGKey(2), input_geom, latent_queries,
                        output_queries, feats, **gkw)["params"]
with mesh_lib.use_mesh(mesh):
    lq_s, oq_s, inn_s, onn_s = shard_gino_inputs(
        mesh, latent_queries=latent_queries, output_queries=output_queries,
        in_neighbors=in_nbrs, out_neighbors=out_nbrs,
    )
    yg = jax.jit(
        lambda p, lq, oq, inn, onn: gino.apply(
            {"params": p}, input_geom, lq, oq, feats,
            in_neighbors=inn, out_neighbors=onn,
        )
    )(gp, lq_s, oq_s, inn_s, onn_s)
print("point-sharded GINO out:", yg.shape,
      "finite:", bool(jnp.isfinite(yg).all()))

# the same params run without any mesh (single-device fallback)
mesh_lib.init(model_parallel_size=1)
y_local = model.apply({"params": params}, x)
print("max |sharded - local|:", float(jnp.abs(y - y_local).max()))
