"""Small shared utilities.

TPU-native re-implementation of the helpers in the reference library
(``/root/reference/neuralop/utils.py``): parameter counting, scaling-factor
validation and the radial energy spectrum used for analysis.
"""

from math import prod
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

Number = Union[int, float]


def count_tensor_params(tensor, dims=None) -> int:
    """Number of real-valued parameters in an array, optionally counting
    only the listed dimensions.

    Complex entries count twice (matches reference
    ``neuralop/utils.py:28-50``).
    """
    shape = (
        tensor.shape if dims is None else [tensor.shape[d] for d in dims]
    )
    n = int(np.prod(shape))
    if jnp.iscomplexobj(tensor):
        n *= 2
    return n


def count_model_params(params) -> int:
    """Total real parameter count of a pytree of arrays."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(count_tensor_params(leaf) for leaf in leaves)


def validate_scaling_factor(
    scaling_factor: Union[None, Number, List[Number], List[List[Number]]],
    n_dim: int,
    n_layers: Optional[int] = None,
) -> Union[None, List[float], List[List[float]]]:
    """Normalize a resolution scaling factor spec.

    Mirrors the semantics of the reference ``validate_scaling_factor``
    (``neuralop/utils.py:151-199``): a scalar is broadcast over dims (and
    layers); per-layer lists are validated for shape.
    """
    if scaling_factor is None:
        return None
    if isinstance(scaling_factor, (float, int)):
        if n_layers is None:
            return [float(scaling_factor)] * n_dim
        return [[float(scaling_factor)] * n_dim] * n_layers
    if isinstance(scaling_factor, (list, tuple)) and len(scaling_factor) > 0:
        if all(isinstance(s, (float, int)) for s in scaling_factor):
            if n_layers is None and len(scaling_factor) == n_dim:
                return [float(s) for s in scaling_factor]
            if n_layers is not None and len(scaling_factor) == n_layers:
                return [[float(s)] * n_dim for s in scaling_factor]
        if all(
            isinstance(s, (list, tuple))
            and len(s) == n_dim
            and all(isinstance(v, (float, int)) for v in s)
            for s in scaling_factor
        ):
            return [[float(v) for v in s] for s in scaling_factor]
    return None


def spectrum_2d(signal, n_observations, normalize=True):
    """Radial 2-D energy spectrum of a (..., s, s) signal.

    JAX equivalent of reference ``neuralop/utils.py:81-146``.
    """
    T = signal.shape[0]
    signal = signal.reshape(T, n_observations, n_observations)
    if normalize:
        signal = jnp.fft.fft2(signal)
    else:
        signal = jnp.fft.rfft2(
            signal, s=(n_observations, n_observations), norm="backward"
        )
    # center low frequencies, take squared modulus
    signal = jnp.fft.fftshift(signal, axes=(-2, -1))
    sq = (signal.real ** 2 + signal.imag ** 2).mean(axis=0)

    k_max = n_observations // 2
    idx = np.indices((n_observations, n_observations)) - k_max
    radius = np.sqrt(idx[0] ** 2 + idx[1] ** 2).astype(np.int64)
    spectrum = np.zeros(k_max)
    sq_np = np.asarray(sq)
    for k in range(1, k_max + 1):
        mask = radius == k
        spectrum[k - 1] = sq_np[mask].sum()
    return jnp.asarray(spectrum)


def compute_explained_variance(frequency_max, s):
    """Explained variance of the first ``frequency_max`` singular values.

    Used by the incremental-FNO trainer (reference ``utils.py:200-223``).
    """
    s = jnp.asarray(s)
    total = jnp.sum(s ** 2)
    return float(jnp.sum(s[:frequency_max] ** 2) / total)


def compute_rank(tensor):
    """Matrix rank helper for incremental-FNO gradient analysis."""
    return jnp.linalg.matrix_rank(tensor)


def compute_stable_rank(tensor):
    """Stable rank ||A||_F^2 / ||A||_2^2."""
    tensor = jnp.asarray(tensor)
    fro = jnp.linalg.norm(tensor.reshape(tensor.shape[0], -1), ord="fro") ** 2
    top = jnp.linalg.norm(tensor.reshape(tensor.shape[0], -1), ord=2) ** 2
    return fro / top


def get_wandb_api_key(api_key_file="config/wandb_api_key.txt"):
    """Read a wandb API key from env or file (reference utils.py:51-80)."""
    import os
    from pathlib import Path

    key = os.environ.get("WANDB_API_KEY")
    if key:
        return key
    path = Path(api_key_file)
    if path.exists():
        return path.read_text().strip()
    return None


def wandb_login(api_key_file="config/wandb_api_key.txt", key=None):
    """Log into wandb if available (reference utils.py:51-80)."""
    try:
        import wandb
    except ImportError:
        return False
    key = key or get_wandb_api_key(api_key_file)
    if key is None:
        return False
    wandb.login(key=key)
    return True


def get_project_root():
    """Repository root (reference utils.py get_project_root)."""
    from pathlib import Path

    return Path(__file__).parent.parent


def set_wandb_api_key(api_key_file="config/wandb_api_key.txt"):
    """Export WANDB_API_KEY from a key file if unset (reference utils)."""
    import os

    if "WANDB_API_KEY" not in os.environ:
        try:
            with open(api_key_file, "r") as f:
                os.environ["WANDB_API_KEY"] = f.read().strip()
        except FileNotFoundError:
            pass


def count_flops(fn, *args, **kwargs):
    """Estimate FLOPs of a jitted callable via XLA cost analysis.

    TPU-native replacement for the reference's torchtnt FLOP demo
    (examples/training/plot_count_flops.py): XLA reports exact flop
    counts for the optimized HLO, no tracing hooks needed.

    Returns a dict with 'flops' (total floating-point operations) and
    'bytes_accessed' when the backend reports them.
    """
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    analysis = dict(analysis or {})
    return {
        "flops": analysis.get("flops", float("nan")),
        "bytes_accessed": analysis.get("bytes accessed", float("nan")),
    }
