"""Training-state persistence (checkpoint/resume).

Equivalent of reference ``neuralop/training/training_state.py``: saves
model parameters (+best copy), optimizer state and an epoch manifest under a
directory; loads them back given matching templates. Serialization is flax
msgpack (pure arrays — no pickles).
"""

import json
from pathlib import Path
from typing import Optional

import flax.serialization
import jax


def save_training_state(
    save_dir,
    save_name: str,
    params,
    opt_state=None,
    epoch: Optional[int] = None,
    best_params=None,
    extra_manifest: Optional[dict] = None,
    data_processor=None,
) -> Path:
    """Write {save_name}.msgpack (+ optimizer.msgpack, manifest.json).

    When ``data_processor`` exposes ``state_dict()`` its fitted state
    (e.g. train-split normalizer statistics) is persisted as
    ``data_processor.json`` so evaluation does not depend on refitting
    the exact training pipeline (see DefaultDataProcessor.state_dict).
    """
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    if data_processor is not None and hasattr(data_processor, "state_dict"):
        try:
            (save_dir / "data_processor.json").write_text(
                json.dumps(data_processor.state_dict())
            )
        except (TypeError, ValueError):
            pass  # non-serializable processor state: weights still saved
    params = jax.device_get(params)
    (save_dir / f"{save_name}.msgpack").write_bytes(
        flax.serialization.to_bytes(params)
    )
    if best_params is not None:
        (save_dir / "best_model.msgpack").write_bytes(
            flax.serialization.to_bytes(jax.device_get(best_params))
        )
    if opt_state is not None:
        (save_dir / "optimizer.msgpack").write_bytes(
            flax.serialization.to_bytes(jax.device_get(opt_state))
        )
    # merge with any existing manifest so a best-model save (which passes
    # epoch=None + best_* keys) never clobbers the resume epoch written by
    # the periodic save, and vice versa
    manifest_path = save_dir / "manifest.json"
    manifest = {}
    if manifest_path.exists():
        try:
            manifest = json.loads(manifest_path.read_text())
        except (json.JSONDecodeError, OSError):
            manifest = {}
    if epoch is not None:
        manifest["epoch"] = epoch
    if extra_manifest:
        manifest.update(extra_manifest)
    manifest_path.write_text(json.dumps(manifest))
    return save_dir


def load_training_state(
    save_dir,
    save_name: str,
    params_template,
    opt_state_template=None,
):
    """Restore (params, opt_state, epoch) saved by save_training_state."""
    save_dir = Path(save_dir)
    params = flax.serialization.from_bytes(
        params_template, (save_dir / f"{save_name}.msgpack").read_bytes()
    )
    # decompress-on-load: checkpoints stored in reduced precision
    # (scripts/compress_checkpoint.py) restore to the template's dtype,
    # so consumers always see the working precision they initialized
    params = jax.tree_util.tree_map(
        lambda t, a: a.astype(t.dtype)
        if hasattr(a, "dtype") and hasattr(t, "dtype") and a.dtype != t.dtype
        else a,
        params_template,
        params,
    )
    opt_state = None
    opt_path = save_dir / "optimizer.msgpack"
    if opt_state_template is not None and opt_path.exists():
        opt_state = flax.serialization.from_bytes(
            opt_state_template, opt_path.read_bytes()
        )
    epoch = None
    manifest_path = save_dir / "manifest.json"
    if manifest_path.exists():
        epoch = json.loads(manifest_path.read_text()).get("epoch")
    return params, opt_state, epoch


def save_training_state_orbax(
    save_dir,
    params,
    opt_state=None,
    epoch: Optional[int] = None,
    async_save: bool = False,
):
    """Checkpoint via orbax (production path: sharding-aware, optionally
    asynchronous so the step loop never blocks on host IO).

    Unlike the msgpack path, orbax records array shardings — on restore
    under the same Mesh, parameters land directly on their devices
    without a host round-trip.
    """
    import orbax.checkpoint as ocp

    save_dir = Path(save_dir).absolute()
    save_dir.mkdir(parents=True, exist_ok=True)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if epoch is not None:
        state["epoch"] = epoch
    ckptr = (
        ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        if async_save
        else ocp.Checkpointer(ocp.StandardCheckpointHandler())
    )
    path = save_dir / "orbax"
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    if async_save:
        ckptr.wait_until_finished()
    return path


def load_training_state_orbax(save_dir, params_template, opt_state_template=None):
    """Restore a checkpoint written by :func:`save_training_state_orbax`."""
    import orbax.checkpoint as ocp

    path = Path(save_dir).absolute()
    if path.name != "orbax":
        path = path / "orbax"
    template = {"params": params_template}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    template["epoch"] = 0
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    try:
        state = ckptr.restore(path, args=ocp.args.StandardRestore(template))
    except BaseException:
        state = ckptr.restore(path)
    return (
        state["params"],
        state.get("opt_state"),
        state.get("epoch"),
    )
