"""neuraloperator_tpu: a TPU-native (JAX/XLA/Pallas) neural-operator framework.

From-scratch rebuild of the capabilities of neuraloperator/neuraloperator
(reference mounted at /root/reference) designed TPU-first: FFTs + MXU
einsums for spectral layers, static-shape padding/masking for irregular
data, jax.sharding meshes for distribution.
"""

__version__ = "0.1.0"

# top-level convenience imports mirroring the reference
# (/root/reference/neuralop/__init__.py:1-19)
from .models import FNO, RNO, TFNO, available_models, get_model  # noqa: F401
from .losses import (  # noqa: F401
    Aggregator,
    BurgersEqnLoss,
    FiniteDiff,
    FourierDiff,
    H1Loss,
    ICLoss,
    LpLoss,
    Relobralo,
    SoftAdapt,
    WeightedSumLoss,
    non_uniform_fd,
)
from .training import Trainer  # noqa: F401
from .data import datasets, transforms  # noqa: F401
from . import parallel  # noqa: F401  (the reference exposes `mpu` here)
from . import serving  # noqa: F401  (TPU-native deployment; no reference analogue)
