from .factorized import (  # noqa: F401
    FactorizationSpec,
    factor_shapes,
    init_factors,
    n_params,
    resolve_spec,
    slice_factors,
    to_tensor,
)
