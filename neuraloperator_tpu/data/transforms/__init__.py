from .data_processors import (  # noqa: F401
    DataProcessor,
    DefaultDataProcessor,
    IncrementalDataProcessor,
    MGPatchingDataProcessor,
    load_data_processor,
)
from .normalizers import (  # noqa: F401
    DictUnitGaussianNormalizer,
    UnitGaussianNormalizer,
)
from .base_transforms import CompositeTransform, DictTransform, Transform  # noqa: F401
from .patching_transforms import (  # noqa: F401
    MGPatchingTransform,
    MGPTensorDataset,
    RandomMGPatch,
)
from .the_well_data_processors import TheWellDataProcessor  # noqa: F401
