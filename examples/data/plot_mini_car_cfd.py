"""Inspecting the mini car-CFD point-cloud dataset.

Counterpart of reference examples/data/plot_mini_car_cfd.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from neuraloperator_tpu.data.datasets import load_mini_car

samples = load_mini_car()
print("samples:", len(samples))
s = samples[0]
for k, v in s.items():
    arr = np.asarray(v)
    print(f"  {k}: {arr.shape} {arr.dtype}")
