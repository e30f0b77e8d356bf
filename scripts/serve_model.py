"""Serve a saved model checkpoint: AOT buckets + optional export.

Loads a metadata checkpoint (``models.save_checkpoint`` layout:
``{name}_metadata.json`` + ``{name}_state_dict.msgpack``), builds a
:class:`neuraloperator_tpu.serving.CompiledForward` endpoint for the
requested batch buckets, reports per-bucket compile time and measured
per-request latency, and optionally writes a portable StableHLO
artifact. No reference counterpart (the reference has no deployment
entry point).

Usage:
  python scripts/serve_model.py --ckpt_dir runs/mymodel --name model \\
      --shape '[1,128,128]' [--buckets '[1,8]'] [--bf16 true] \\
      [--export model.stablehlo]
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neuraloperator_tpu.config import ConfigBase, make_config_from_cli
from neuraloperator_tpu.models.base_model import (
    from_checkpoint,
    load_checkpoint,
)
from neuraloperator_tpu.serving import CompiledForward, export_forward


@dataclass
class ServeConfig(ConfigBase):
    ckpt_dir: str = "runs/model"
    name: str = "model"
    # per-sample input shape (channels, *spatial); batch comes from buckets
    shape: List[int] = field(default_factory=lambda: [1, 128, 128])
    buckets: List[int] = field(default_factory=lambda: [1, 8])
    bf16: bool = False
    export: Optional[str] = None  # path for a StableHLO artifact
    probe_iters: int = 10


def main():
    config = make_config_from_cli(ServeConfig)
    model = from_checkpoint(config.ckpt_dir, config.name)
    example = jnp.zeros((config.buckets[0], *config.shape), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), example)
    )
    ckpt = Path(config.ckpt_dir)
    if (ckpt / f"{config.name}_state_dict.msgpack").exists():
        # models.save_checkpoint layout (full variables)
        variables = load_checkpoint(
            model, template, config.ckpt_dir, config.name
        )
        params = variables["params"]
    else:
        # Trainer training-state layout ({name}.msgpack = params only;
        # the arch metadata sidecar is written by Trainer.train)
        import flax.serialization

        params = flax.serialization.from_bytes(
            template["params"],
            (ckpt / f"{config.name}.msgpack").read_bytes(),
        )

    # bake the training-time normalizers into the endpoint when the
    # checkpoint carries its data-processor sidecar: requests then flow
    # raw-space in, raw-space out (without this, an encode_input/output
    # model silently serves wrong-scale predictions)
    from neuraloperator_tpu.data.transforms import load_data_processor

    dp = load_data_processor(config.ckpt_dir)
    pre = post = None
    if dp is not None:
        if getattr(dp, "in_normalizer", None) is not None:
            pre = dp.in_normalizer.transform
        if getattr(dp, "out_normalizer", None) is not None:
            post = dp.out_normalizer.inverse_transform
        print("baked saved normalizers into the endpoint")

    srv = CompiledForward(
        model, params, example, batch_sizes=config.buckets,
        param_dtype=jnp.bfloat16 if config.bf16 else None,
        preprocess_fn=pre, postprocess_fn=post,
    )
    print("compile seconds per bucket:",
          {b: round(s, 2) for b, s in srv.compile_seconds.items()})
    for b in srv.batch_sizes:
        lat = srv.latency_probe(b, iters=config.probe_iters)
        print(f"bucket {b}: {lat * 1e3:.2f} ms/request "
              f"({b / lat:.1f} samples/s)")

    # smoke a ragged request through the bucket dispatcher
    n = max(1, srv.batch_sizes[-1] - 1)
    out = srv(jnp.asarray(
        np.random.RandomState(0).randn(n, *config.shape), jnp.float32
    ))
    leaf = jax.tree_util.tree_leaves(out)[0]
    print(f"request({n}) -> {leaf.shape}, finite: "
          f"{bool(jnp.isfinite(leaf).all())}")

    if config.export:
        export_params = params
        if config.bf16:
            # match the probed endpoint: bake bf16 weights into the artifact
            export_params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                params,
            )
        blob = export_forward(
            model, export_params, example, path=config.export,
            preprocess_fn=pre, postprocess_fn=post,
        )
        print(f"exported {len(blob) / 1e6:.1f} MB -> {config.export}")


if __name__ == "__main__":
    main()
