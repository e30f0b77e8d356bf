"""Radial energy spectrum of Darcy solutions.

Counterpart of reference examples/data/plot_darcy_flow_spectrum.py,
using ``spectrum_2d`` (reference neuralop/utils.py:81-146).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.utils import spectrum_2d

train_loader, _, _ = load_darcy_flow_small(
    n_train=32, n_tests=[8], batch_size=32, test_batch_sizes=[8],
    test_resolutions=[16],
)
batch = next(iter(train_loader))
y = np.asarray(batch["y"])[:, 0]  # (b, 16, 16)
spec = np.asarray(spectrum_2d(y, 16))
print("spectrum shape:", spec.shape)
print("energy by radial wavenumber (first 8):",
      np.round(spec[:8] / spec.max(), 4))
print("decay ratio k=1 vs k=7:", round(float(spec[1] / spec[7]), 1))
