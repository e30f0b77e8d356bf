"""Training an SFNO on spherical shallow-water dynamics.

Counterpart of the reference `plot_SFNO_swe.py`, using the in-package
spherical SWE generator and the Legendre-matmul SHT.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from neuraloperator_tpu.data.datasets import load_spherical_swe
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import SFNO
from neuraloperator_tpu.training import Trainer, adamw

train_loader, test_loaders, _ = load_spherical_swe(
    n_train=32, n_test=8, batch_size=4, test_batch_sizes=(4,),
    train_resolution=(32, 64), test_resolutions=((32, 64),),
)
model = SFNO(
    n_modes=(16, 16), in_channels=3, out_channels=3, hidden_channels=32,
    n_layers=4,
)
l2 = LpLoss(d=2)
trainer = Trainer(model=model, n_epochs=10, verbose=True, eval_interval=5)
metrics = trainer.train(
    train_loader, test_loaders, adamw(1e-3), training_loss=l2,
    eval_losses={"l2": l2},
)
print({k: round(v, 5) for k, v in metrics.items()})
