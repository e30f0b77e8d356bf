from .data_processors import (  # noqa: F401
    DataProcessor,
    DefaultDataProcessor,
    IncrementalDataProcessor,
    MGPatchingDataProcessor,
)
from .normalizers import (  # noqa: F401
    DictUnitGaussianNormalizer,
    UnitGaussianNormalizer,
)
