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
from .car_cfd_dataset import CarCFDDataset, load_mini_car  # noqa: F401
from .hdf5_dataset import H5pyDataset, ZarrDataset  # noqa: F401
from .mesh_datamodule import MeshDataModule  # noqa: F401
from .nonlinear_poisson import NonlinearPoissonDataset  # noqa: F401
from .ot_datamodule import OTDataModule, sinkhorn_log  # noqa: F401
from .spherical_swe import SphericalSWESolver, load_spherical_swe  # noqa: F401
from .the_well_dataset import ActiveMatterDataset, MHD64Dataset, WellDataset  # noqa: F401
from .web_utils import download_from_url, download_from_zenodo_record  # noqa: F401
from .car_ot_dataset import CarOTDataset, CFDDataProcessor, load_car_ot  # noqa: F401
