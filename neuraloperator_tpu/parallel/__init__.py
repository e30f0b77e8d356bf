from . import comm, mesh  # noqa: F401
from .distributed_fft import (  # noqa: F401
    DistributedSpectralConv2d,
    distributed_spectral_conv2d,
    halo_exchange,
)
