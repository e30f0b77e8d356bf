from . import comm, mesh  # noqa: F401
from .distributed_fft import (  # noqa: F401
    DistributedSpectralConv2d,
    DistributedSpectralConv3d,
    distributed_spectral_conv2d,
    distributed_spectral_conv3d,
    halo_exchange,
)
from .distributed_gno import (  # noqa: F401
    point_sharding,
    shard_gino_inputs,
    shard_neighbors,
    shard_points,
)
from .distributed_sht import (  # noqa: F401
    DistributedSphericalConv,
    distributed_spherical_conv,
)
from .pipeline import gpipe, pipelined_fno_forward  # noqa: F401
from .zero import zero_specs, shard_opt_state  # noqa: F401
