from .darcy import DarcyDataset, load_darcy_flow_small  # noqa: F401
from .pt_dataset import PTDataset  # noqa: F401
from .tensor_dataset import DataLoader, DictDataset, TensorDataset  # noqa: F401
