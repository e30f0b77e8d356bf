"""SFNO: Spherical Fourier Neural Operator.

Equivalent of reference ``neuralop/models/sfno.py``: an FNO whose
convolution module is :class:`SphericalConv` with dense weights.
"""

from typing import Optional, Tuple, Union

from ..layers.spherical_convolution import SphericalConv
from .base_model import register_model
from .fno import FNO


@register_model(name="SFNO")
class SFNO(FNO):
    """FNO over the sphere (reference sfno.py:10: partialclass with
    factorization='dense', conv_module=SphericalConv)."""

    factorization: Optional[str] = "dense"
    conv_module: type = SphericalConv
