"""Loading and inspecting the shipped small Darcy flow dataset.

Counterpart of reference examples/data/plot_darcy_flow.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from neuraloperator_tpu.data.datasets import load_darcy_flow_small

train_loader, test_loaders, data_processor = load_darcy_flow_small(
    n_train=100, n_tests=[32, 32], batch_size=8, test_batch_sizes=[8, 8],
    test_resolutions=[16, 32],
)
batch = next(iter(train_loader))
x, y = np.asarray(batch["x"]), np.asarray(batch["y"])
print("x:", x.shape, "y:", y.shape)
print("x range:", round(float(x.min()), 3), "..", round(float(x.max()), 3))
print("test resolutions:", sorted(test_loaders))
print("processor:", type(data_processor).__name__,
      "normalizes y in train only")
