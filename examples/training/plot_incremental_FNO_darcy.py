"""Incremental FNO: grow spectral modes during training (iFNO)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import IncrementalFNOTrainer, adamw

train_loader, test_loaders, dp = load_darcy_flow_small(
    n_train=200, n_tests=[50], batch_size=16, test_batch_sizes=[16],
    test_resolutions=[16],
)
model = FNO(
    n_modes=(8, 8), max_n_modes=(16, 16), in_channels=1, out_channels=1,
    hidden_channels=24,
)
trainer = IncrementalFNOTrainer(
    model=model, n_epochs=10, data_processor=dp,
    incremental_loss_gap=True, incremental_loss_eps=1e-3,
    starting_n_modes=(4, 4), verbose=True,
)
trainer.train(train_loader, test_loaders, adamw(5e-3),
              training_loss=LpLoss(d=2))
print("final modes:", trainer.current_n_modes)
