from .darcy import DarcyDataset, load_darcy_flow_small, load_darcy_pt  # noqa: F401
from .pt_dataset import PTDataset  # noqa: F401
from .tensor_dataset import (  # noqa: F401
    DataLoader,
    DictDataset,
    GeneralTensorDataset,
    TensorDataset,
)
from .burgers import BurgersDataset, load_burgers_1d, load_mini_burgers_1dtime  # noqa: F401
from .navier_stokes import NavierStokesDataset, load_navier_stokes_pt  # noqa: F401
from .synthetic import (  # noqa: F401
    gaussian_random_field,
    generate_burgers_files,
    generate_darcy_files,
    solve_burgers_1d,
    solve_darcy,
)
from .car_cfd_dataset import CarCFDDataset, load_mini_car  # noqa: F401
from .synthetic_cfd import (  # noqa: F401
    generate_cfd_sample,
    load_synthetic_cfd,
)
from .hdf5_dataset import H5pyDataset, ZarrDataset  # noqa: F401
from .mesh_datamodule import MeshDataModule  # noqa: F401
from .nonlinear_poisson import (  # noqa: F401
    NonlinearPoissonDataset,
    PoissonGINODataProcessor,
    generate_latent_queries,
    generate_output_queries,
    load_nonlinear_poisson_pt,
)
from .ot_datamodule import OTDataModule, sinkhorn_log  # noqa: F401
from .spherical_swe import (  # noqa: F401
    SphericalSWEDataset,
    SphericalSWESolver,
    load_spherical_swe,
)
from .the_well_dataset import ActiveMatterDataset, MHD64Dataset, WellDataset  # noqa: F401
from .web_utils import (  # noqa: F401
    calculate_md5,
    check_integrity,
    check_md5,
    download_from_url,
    download_from_zenodo_record,
)
from .car_ot_dataset import (  # noqa: F401
    CarOTDataset,
    CFDDataProcessor,
    load_car_ot,
    load_saved_ot,
)
from .prefetch import PrefetchLoader  # noqa: F401
