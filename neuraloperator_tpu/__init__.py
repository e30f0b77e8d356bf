"""neuraloperator_tpu: a TPU-native (JAX/XLA/Pallas) neural-operator framework.

From-scratch rebuild of the capabilities of neuraloperator/neuraloperator
(reference mounted at /root/reference) designed TPU-first: FFTs + MXU
einsums for spectral layers, static-shape padding/masking for irregular
data, jax.sharding meshes for distribution.
"""

__version__ = "0.1.0"

from .models import FNO, TFNO, get_model, available_models  # noqa: F401
from .losses import LpLoss, H1Loss  # noqa: F401
from .training import Trainer  # noqa: F401
