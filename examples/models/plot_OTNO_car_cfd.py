"""OTNO on the shipped car-CFD OT dataset.

Counterpart of reference examples/models/plot_OTNO_car_cfd.py: encode
pressure prediction through an optimal-transport map onto a latent
torus, run an FNO there, decode back to the car surface.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import numpy as np

from neuraloperator_tpu.data.datasets import CarOTDataset, CFDDataProcessor
from neuraloperator_tpu.models import OTNO

try:
    ds = CarOTDataset()
except FileNotFoundError:
    print("shipped OT archive unavailable; see scripts/train_otno_carcfd.py")
    raise SystemExit

proc = CFDDataProcessor()
sample = proc.preprocess(ds.train_data[0])
x = sample["x"]
model = OTNO(n_modes=(16, 16), in_channels=x.shape[1], out_channels=1,
             hidden_channels=32)
v = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                        ind_dec=sample["ind_dec"])
out = model.apply(v, x, ind_dec=sample["ind_dec"])
print("surface prediction:", out.shape, "target:", sample["y"].shape)
print("finite:", bool(np.isfinite(np.asarray(out)).all()))
