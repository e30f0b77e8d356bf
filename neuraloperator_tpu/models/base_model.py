"""Model registry and metadata-carrying checkpoints.

Equivalent of reference ``neuralop/models/base_model.py``: models register
themselves by name (``__init_subclass__``), init arguments are recorded so a
model can be reconstructed purely from a checkpoint
(``from_checkpoint``), and a config-driven factory ``get_model`` builds
models from a config tree.

In JAX, model objects are stateless flax modules (dataclasses); parameters
live in a separate pytree. A "checkpoint" is therefore
``{name}_metadata.json`` (class + init kwargs + version) plus
``{name}_state_dict.msgpack`` (the parameter pytree).
"""

import dataclasses
import json
import warnings
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import flax.serialization
import jax


_MODEL_REGISTRY: Dict[str, type] = {}


def register_model(cls=None, *, name: Optional[str] = None):
    """Register a model class under ``name`` (default: class name)."""

    def wrap(c):
        _MODEL_REGISTRY[(name or c.__name__).lower()] = c
        return c

    return wrap(cls) if cls is not None else wrap


def available_models():
    """List the registered model names (reference base_model.py:239+)."""
    return sorted(_MODEL_REGISTRY)


def get_model_class(arch: str) -> type:
    try:
        return _MODEL_REGISTRY[arch.lower()]
    except KeyError:
        raise ValueError(
            f"Got model_arch={arch!r}, expected one of {available_models()}"
        )


_VERSION = "0.1.0"


def _module_init_kwargs(module: nn.Module) -> Dict[str, Any]:
    """JSON-serializable init kwargs of a linen module (a dataclass)."""
    out = {}
    for f in dataclasses.fields(module):
        if f.name in ("parent", "name"):
            continue
        v = getattr(module, f.name)
        if callable(v) and not isinstance(v, type):
            v = {"__callable__": getattr(v, "__name__", str(v))}
        elif isinstance(v, type):
            v = {"__class__": v.__name__}
        elif isinstance(v, tuple):
            v = list(v)
        out[f.name] = v
    return out


def save_checkpoint(
    module: nn.Module,
    variables,
    save_folder,
    save_name: str,
):
    """Save parameters + reconstruction metadata.

    Mirrors reference ``BaseModel.save_checkpoint``
    (base_model.py:147-157): ``{save_name}_state_dict`` + metadata.
    """
    folder = Path(save_folder)
    folder.mkdir(parents=True, exist_ok=True)
    state_path = folder / f"{save_name}_state_dict.msgpack"
    variables = jax.device_get(variables)
    state_path.write_bytes(flax.serialization.to_bytes(variables))
    save_arch_metadata(module, folder, save_name)


def save_arch_metadata(module: nn.Module, save_folder, save_name: str):
    """Write only the ``{save_name}_metadata.json`` reconstruction
    sidecar (architecture name + init kwargs) — used by the Trainer so
    its weight-only training-state checkpoints can be rebuilt without
    the training script's config (e.g. by ``scripts/serve_model.py``)."""
    folder = Path(save_folder)
    folder.mkdir(parents=True, exist_ok=True)
    meta = {
        "_name": type(module).__name__,
        "_version": _VERSION,
        "init_kwargs": _module_init_kwargs(module),
    }
    (folder / f"{save_name}_metadata.json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(module: nn.Module, variables_template, save_folder, save_name):
    """Load params saved by :func:`save_checkpoint` into a matching pytree."""
    folder = Path(save_folder)
    data = (folder / f"{save_name}_state_dict.msgpack").read_bytes()
    return flax.serialization.from_bytes(variables_template, data)


def from_checkpoint(save_folder, save_name: str, extra_kwargs: Optional[dict] = None):
    """Reconstruct (module, load_fn) from checkpoint metadata.

    Returns the module; call ``load_checkpoint`` with an initialized
    variables template to restore parameters (flax needs a template pytree).
    """
    folder = Path(save_folder)
    meta = json.loads((folder / f"{save_name}_metadata.json").read_text())
    if meta.get("_version") != _VERSION:
        warnings.warn(
            f"Checkpoint saved with version {meta.get('_version')}, current "
            f"version is {_VERSION}. Proceeding, but parameters may mismatch."
        )
    cls = get_model_class(meta["_name"])
    kwargs = {
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in meta["init_kwargs"].items()
        if not isinstance(v, dict) or not (
            "__callable__" in v or "__class__" in v
        )
    }
    if extra_kwargs:
        kwargs.update(extra_kwargs)
    return cls(**kwargs)


def get_model(config) -> nn.Module:
    """Config-driven factory (reference ``get_model``, base_model.py:188-236).

    ``config`` is a dict(-like) with a ``model`` sub-dict containing
    ``model_arch`` plus the model's init kwargs. Multigrid patching
    multiplies ``data_channels`` into ``in_channels`` as in the reference.
    """
    if hasattr(config, "to_dict"):
        config = config.to_dict()
    cfg = dict(config)
    model_cfg = dict(cfg.get("model", cfg))
    arch = model_cfg.pop("model_arch", None) or model_cfg.pop("arch", None)
    if arch is None:
        raise ValueError("config.model must define 'model_arch'")
    cls = get_model_class(arch)

    data_channels = model_cfg.pop("data_channels", None)
    if data_channels is not None:
        # account for multigrid patching appending coarse levels as channels
        patching_levels = (
            cfg.get("patching", {}).get("levels", 0) if "patching" in cfg else 0
        )
        if patching_levels:
            data_channels *= patching_levels + 1
        model_cfg["in_channels"] = data_channels

    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in model_cfg.items():
        if k in field_names:
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        else:
            warnings.warn(f"get_model: ignoring config key {k!r} for {arch}")
    return cls(**kwargs)
