from .data_processors import (  # noqa: F401
    DataProcessor,
    DefaultDataProcessor,
    IncrementalDataProcessor,
)
from .normalizers import (  # noqa: F401
    DictUnitGaussianNormalizer,
    UnitGaussianNormalizer,
)
