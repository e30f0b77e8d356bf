from .data_losses import (  # noqa: F401
    H1Loss,
    HdivLoss,
    LpLoss,
    MSELoss,
    PointwiseQuantileLoss,
)
from .differentiation import (  # noqa: F401
    FiniteDiff,
    get_non_uniform_fd_weights,
    non_uniform_fd,
    FourierDiff,
    central_diff_1d,
    central_diff_2d,
    central_diff_3d,
)
from .equation_losses import (  # noqa: F401
    BurgersEqnLoss,
    ICLoss,
    PoissonBoundaryLoss,
    PoissonEqnLoss,
    PoissonInteriorLoss,
)
from .meta_losses import (  # noqa: F401
    Aggregator,
    FieldwiseAggregatorLoss,
    Relobralo,
    SoftAdapt,
    WeightedSumLoss,
)
