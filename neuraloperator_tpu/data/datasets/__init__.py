from .darcy import DarcyDataset, load_darcy_flow_small  # noqa: F401
from .pt_dataset import PTDataset  # noqa: F401
from .tensor_dataset import DataLoader, DictDataset, TensorDataset  # noqa: F401
from .burgers import BurgersDataset, load_burgers_1d, load_mini_burgers_1dtime  # noqa: F401
from .navier_stokes import load_navier_stokes_pt  # noqa: F401
from .synthetic import (  # noqa: F401
    gaussian_random_field,
    generate_burgers_files,
    generate_darcy_files,
    solve_burgers_1d,
    solve_darcy,
)
