"""Import reference (PyTorch) FNO checkpoints into flax params.

Supports dense spectral weights (tltorch DenseTensor ``weight.tensor``)
AND the factorized layouts (ComplexTucker ``weight.core``/
``weight.factors.{i}``, ComplexCP ``weight.weights``/``weight.factors.{i}``,
ComplexTT ``weight.factors.{i}``), mapping onto this package's
``w_core``/``w_lambdas``/``w_factor_{i}`` split-real storage.

Counterpart of the reference's metadata-carrying checkpoints
(``/root/reference/neuralop/models/base_model.py:84-185``): the reference
saves ``{save_name}_state_dict.pt`` (a torch ``state_dict`` with a
``_metadata`` entry of init kwargs) + ``{save_name}_metadata.pkl``. This
module converts a dense-FNO state dict into this package's parameter
pytree, so reference-trained weights run on TPU unchanged.

Layout facts the conversion relies on (all verified against the reference
source):

* spectral weights are stored fftshift-CENTERED along all but the last
  mode axis and low-first along the rfft'd last axis
  (``spectral_convolution.py:465-519``) — exactly this package's storage
  order (``ops/fourier.py:gather_center_modes``), so modes map 1:1; only
  complex -> split-real ``(2, ...)`` stacking is applied.
* ChannelMLP layers are Conv1d with kernel size 1 (``channel_mlp.py:69``):
  weight ``(out, in, 1)`` -> our ``w{j}`` ``(out, in)``.
* skip modules: 'linear' = ``Flattened1dConv.conv`` Conv1d(out, in, 1),
  'soft-gating' = per-channel ``weight (1, C, 1, ..)`` (+ optional bias)
  (``skip_connections.py:53-130``).

torch is used only as the deserializer; no torch ops run.
"""

import re
from pathlib import Path
from typing import Dict

import numpy as np

__all__ = [
    "convert_dense_fno_state_dict",
    "convert_reference_state_dict",
    "load_reference_fno_checkpoint",
]


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        try:
            return t.numpy()
        except TypeError:  # complex on some builds
            return np.asarray(t)
    return np.asarray(t)


def _complex_to_storage(arr: np.ndarray) -> np.ndarray:
    """complex (in, out, modes...) -> split-real (2, in, out, modes...).

    Also accepts torch's ``view_as_real`` convention (real array with a
    trailing dim of 2), which tltorch's Complex* factorized tensors use
    for their factor parameters.
    """
    if np.iscomplexobj(arr):
        return np.stack([arr.real, arr.imag]).astype(np.float32)
    if arr.shape[-1] == 2:
        return np.moveaxis(arr, -1, 0).astype(np.float32)
    raise ValueError(
        f"expected a complex tensor or view_as_real layout, got shape "
        f"{arr.shape} dtype {arr.dtype}"
    )


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_PATTERNS = [
    # (regex, target-path builder, transform)
    (re.compile(r"^(lifting|projection)\.fcs\.(\d+)\.weight$"),
     lambda m: (m.group(1), f"w{m.group(2)}"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^(lifting|projection)\.fcs\.(\d+)\.bias$"),
     lambda m: (m.group(1), f"b{m.group(2)}"),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.convs\.(\d+)\.weight(?:\.tensor)?$"),
     lambda m: ("fno_blocks", f"conv_{m.group(1)}", "w_weight"),
     _complex_to_storage),
    # tltorch factorized layouts (reference spectral_convolution.py:362-370;
    # ComplexTucker/ComplexCP/ComplexTT parameters): core/weights/factors
    (re.compile(r"^fno_blocks\.convs\.(\d+)\.weight\.core$"),
     lambda m: ("fno_blocks", f"conv_{m.group(1)}", "w_core"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.convs\.(\d+)\.weight\.weights$"),
     lambda m: ("fno_blocks", f"conv_{m.group(1)}", "w_lambdas"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.convs\.(\d+)\.weight\.factors\.(\d+)$"),
     lambda m: ("fno_blocks", f"conv_{m.group(1)}", f"w_factor_{m.group(2)}"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.convs\.(\d+)\.bias$"),
     lambda m: ("fno_blocks", f"conv_{m.group(1)}", "bias"),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.fno_skips\.(\d+)\.conv\.weight$"),
     lambda m: ("fno_blocks", f"fno_skip_{m.group(1)}", "weight"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.fno_skips\.(\d+)\.(weight|bias)$"),
     lambda m: ("fno_blocks", f"fno_skip_{m.group(1)}", m.group(2)),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.channel_mlp_skips\.(\d+)\.conv\.weight$"),
     lambda m: ("fno_blocks", f"channel_mlp_skip_{m.group(1)}", "weight"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.channel_mlp_skips\.(\d+)\.(weight|bias)$"),
     lambda m: ("fno_blocks", f"channel_mlp_skip_{m.group(1)}", m.group(2)),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.channel_mlp\.(\d+)\.fcs\.(\d+)\.weight$"),
     lambda m: ("fno_blocks", f"channel_mlp_{m.group(1)}", f"w{m.group(2)}"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.channel_mlp\.(\d+)\.fcs\.(\d+)\.bias$"),
     lambda m: ("fno_blocks", f"channel_mlp_{m.group(1)}", f"b{m.group(2)}"),
     lambda a: a.astype(np.float32)),
    # ---- UNO: per-layer FNOBlocks modules `fno_blocks.{i}.*` + horizontal
    # skips (reference models/uno.py:271-312) -> our `block_{i}/*`,
    # `horizontal_skip_{i}` (models/uno.py) ----
    (re.compile(r"^fno_blocks\.(\d+)\.convs\.(\d+)\.weight(?:\.tensor)?$"),
     lambda m: (f"block_{m.group(1)}", f"conv_{m.group(2)}", "w_weight"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.(\d+)\.convs\.(\d+)\.weight\.core$"),
     lambda m: (f"block_{m.group(1)}", f"conv_{m.group(2)}", "w_core"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.(\d+)\.convs\.(\d+)\.weight\.weights$"),
     lambda m: (f"block_{m.group(1)}", f"conv_{m.group(2)}", "w_lambdas"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.(\d+)\.convs\.(\d+)\.weight\.factors\.(\d+)$"),
     lambda m: (f"block_{m.group(1)}", f"conv_{m.group(2)}",
                f"w_factor_{m.group(3)}"),
     _complex_to_storage),
    (re.compile(r"^fno_blocks\.(\d+)\.convs\.(\d+)\.bias$"),
     lambda m: (f"block_{m.group(1)}", f"conv_{m.group(2)}", "bias"),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.(\d+)\.fno_skips\.(\d+)\.conv\.weight$"),
     lambda m: (f"block_{m.group(1)}", f"fno_skip_{m.group(2)}", "weight"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.(\d+)\.fno_skips\.(\d+)\.(weight|bias)$"),
     lambda m: (f"block_{m.group(1)}", f"fno_skip_{m.group(2)}", m.group(3)),
     lambda a: a.astype(np.float32)),
    (re.compile(
        r"^fno_blocks\.(\d+)\.channel_mlp_skips\.(\d+)\.conv\.weight$"),
     lambda m: (f"block_{m.group(1)}", f"channel_mlp_skip_{m.group(2)}",
                "weight"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.(\d+)\.channel_mlp_skips\.(\d+)\.(weight|bias)$"),
     lambda m: (f"block_{m.group(1)}", f"channel_mlp_skip_{m.group(2)}",
                m.group(3)),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^fno_blocks\.(\d+)\.channel_mlp\.(\d+)\.fcs\.(\d+)\.weight$"),
     lambda m: (f"block_{m.group(1)}", f"channel_mlp_{m.group(2)}",
                f"w{m.group(3)}"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^fno_blocks\.(\d+)\.channel_mlp\.(\d+)\.fcs\.(\d+)\.bias$"),
     lambda m: (f"block_{m.group(1)}", f"channel_mlp_{m.group(2)}",
                f"b{m.group(3)}"),
     lambda a: a.astype(np.float32)),
    (re.compile(r"^horizontal_skips\.(\d+)\.conv\.weight$"),
     lambda m: (f"horizontal_skip_{m.group(1)}", "weight"),
     lambda a: a.squeeze(-1).astype(np.float32)),
    (re.compile(r"^horizontal_skips\.(\d+)\.(weight|bias)$"),
     lambda m: (f"horizontal_skip_{m.group(1)}", m.group(2)),
     lambda a: a.astype(np.float32)),
    # ---- GINO: GNOBlock kernel MLPs are torch Linear stacks
    # (`gno_{in,out}.integral_transform.channel_mlp.fcs.{j}`, reference
    # models/gino.py:296-378, layers/channel_mlp.py:122-187); flax Dense
    # kernels are (in, out) = torch weight transposed ----
    (re.compile(
        r"^(gno_in|gno_out)\.integral_transform\.channel_mlp\.fcs\.(\d+)"
        r"\.weight$"),
     lambda m: (m.group(1), "integral_transform", "channel_mlp",
                f"fc{m.group(2)}", "kernel"),
     lambda a: a.T.astype(np.float32)),
    (re.compile(
        r"^(gno_in|gno_out)\.integral_transform\.channel_mlp\.fcs\.(\d+)"
        r"\.bias$"),
     lambda m: (m.group(1), "integral_transform", "channel_mlp",
                f"fc{m.group(2)}", "bias"),
     lambda a: a.astype(np.float32)),
]


def convert_dense_fno_state_dict(state_dict: Dict, params_template=None):
    """Convert a reference ``state_dict`` into flax params.

    Covers the FNO family (dense + tltorch-factorized spectral weights),
    SFNO (same key layout; dhconv weights ``(in, out, l_modes)``, reference
    ``spherical_convolution.py:364-388``), UNO (per-layer FNOBlocks +
    horizontal skips, reference ``uno.py:271-312``), and GINO (GNO kernel
    Linear stacks + latent FNOBlocks, reference ``gino.py:296-378``).

    ``params_template`` (our ``model.init(...)['params']`` tree), when
    given, is used to validate that every converted leaf lands on an
    existing parameter with the right shape — a conversion that silently
    drops or misshapes weights raises instead.
    """
    out: Dict = {}
    unmatched = []
    for key, value in state_dict.items():
        if key == "_metadata":
            continue
        arr = _to_numpy(value)
        for pat, to_path, tf in _PATTERNS:
            m = pat.match(key)
            if m:
                _set(out, to_path(m), tf(arr))
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise ValueError(
            "unconverted reference state-dict keys (FNO/TFNO/SFNO/UNO/GINO "
            f"layouts expected): {unmatched}"
        )

    if params_template is not None:
        import jax

        def check(path, tmpl):
            node = out
            for p in path:
                k = getattr(p, "key", str(p))
                if k not in node:
                    raise ValueError(
                        f"converted params missing {'/'.join(str(getattr(q, 'key', q)) for q in path)}"
                    )
                node = node[k]
            if tuple(node.shape) != tuple(tmpl.shape):
                raise ValueError(
                    f"shape mismatch at {path}: converted {node.shape} "
                    f"vs expected {tmpl.shape}"
                )
            return node.astype(tmpl.dtype)

        flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
        leaves = [check(path, tmpl) for path, tmpl in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return out


# the importer covers FNO/TFNO/SFNO/UNO/GINO — alias under the family-
# neutral name
convert_reference_state_dict = convert_dense_fno_state_dict


def load_reference_fno_checkpoint(save_folder, save_name, params_template=None):
    """Load a reference ``save_checkpoint`` folder into flax params.

    Reads ``{save_name}_state_dict.pt`` (torch as deserializer) and returns
    ``(params, init_kwargs)`` where ``init_kwargs`` comes from
    ``{save_name}_metadata.pkl`` when present (reference
    ``base_model.py:147-185``).
    """
    import torch

    save_folder = Path(save_folder)
    state = torch.load(
        save_folder / f"{save_name}_state_dict.pt",
        map_location="cpu",
        weights_only=False,
    )
    init_kwargs = None
    meta = save_folder / f"{save_name}_metadata.pkl"
    if meta.exists():
        init_kwargs = torch.load(meta, weights_only=False)
    params = convert_dense_fno_state_dict(state, params_template)
    return params, init_kwargs
