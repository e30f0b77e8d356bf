"""Generate Darcy flow data with the in-package finite-volume solver."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import tempfile
from pathlib import Path

from neuraloperator_tpu.data.datasets.synthetic import generate_darcy_files

out = Path(tempfile.mkdtemp())
generate_darcy_files(out, n_train=20, n_test=5, resolutions=(16, 32))
print("wrote:", sorted(p.name for p in out.iterdir()))
