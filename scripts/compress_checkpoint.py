"""Compress a msgpack checkpoint to bf16 storage, with an eval-equivalence check.

Backs the artifacts/ policy (artifacts/README.md): large f32 checkpoints
may be committed in bf16 (half the bytes) when the cast is shown to be
eval-equivalent. This script:

1. loads ``<dir>/<name>.msgpack`` (raw flax msgpack pytree — no template
   needed for a pure cast),
2. casts every f32 leaf to bf16 and writes ``<dir>/<name>_bf16.msgpack``,
3. if metadata (``<name>_metadata.json``) is present, rebuilds the model
   via the registry and reports the relative output delta between f32 and
   bf16 parameters on a seeded random batch — the recorded
   eval-equivalence number.

Usage:
  python scripts/compress_checkpoint.py --dir artifacts/ns128_f32 \
      --name best_model --spatial 128
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--name", default="best_model")
    p.add_argument("--spatial", type=int, default=128,
                   help="spatial resolution of the equivalence-check batch")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--no-eval", action="store_true",
                   help="cast only; skip the model-rebuild output check")
    p.add_argument("--dtype", default="bf16", choices=("bf16", "f16"),
                   help="storage dtype; f16 keeps 3 more mantissa bits "
                        "(use when bf16's ~2^-9 relative rounding exceeds "
                        "the checkpoint's eval error)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.serialization
    from flax.serialization import msgpack_restore, msgpack_serialize

    folder = Path(args.dir)
    raw = (folder / f"{args.name}.msgpack").read_bytes()
    tree = msgpack_restore(raw)

    store_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float16

    def cast(leaf):
        if isinstance(leaf, np.ndarray) and leaf.dtype == np.float32:
            return jnp.asarray(leaf).astype(store_dtype)
        return leaf

    tree_bf16 = jax.tree_util.tree_map(cast, tree)
    out_path = folder / f"{args.name}_{args.dtype}.msgpack"
    out_path.write_bytes(
        msgpack_serialize(jax.device_get(tree_bf16), in_place=True)
    )
    result = {
        "in_bytes": len(raw),
        "out_bytes": out_path.stat().st_size,
        "path": str(out_path),
    }

    meta_path = folder / f"{args.name}_metadata.json"
    if not args.no_eval and meta_path.exists():
        from neuraloperator_tpu.models.base_model import from_checkpoint

        model = from_checkpoint(folder, args.name)
        meta = json.loads(meta_path.read_text())
        in_ch = meta["init_kwargs"].get("in_channels", 1)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randn(args.batch, in_ch, args.spatial, args.spatial),
            jnp.float32,
        )
        params_f32 = msgpack_restore(raw)
        # evaluate through the real usage path: a consumer of the
        # compressed checkpoint restores it and casts params back to
        # f32 before apply, so the delta measured here is purely the
        # storage rounding
        params_rt = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if a.dtype in (jnp.bfloat16, jnp.float16) else a,
            tree_bf16,
        )
        y32 = jax.jit(model.apply)({"params": params_f32}, x)
        y16 = jax.jit(model.apply)({"params": params_rt}, x)
        rel = float(
            jnp.linalg.norm(
                y16.astype(jnp.float32) - y32.astype(jnp.float32)
            )
            / jnp.linalg.norm(y32.astype(jnp.float32))
        )
        result[f"eval_rel_l2_{args.dtype}_vs_f32"] = rel
    print(json.dumps(result))


if __name__ == "__main__":
    main()
