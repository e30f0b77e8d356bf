"""Training a UNO (U-shaped Neural Operator) on Darcy flow."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import UNO
from neuraloperator_tpu.training import Trainer, adamw

train_loader, test_loaders, data_processor = load_darcy_flow_small(
    n_train=500, n_tests=[50], batch_size=16, test_batch_sizes=[16],
    test_resolutions=[16],
)
model = UNO(
    in_channels=1, out_channels=1, hidden_channels=32,
    lifting_channels=64, projection_channels=64, n_layers=5,
    uno_out_channels=(16, 32, 32, 32, 16),
    uno_n_modes=((8, 8),) * 5,
    uno_scalings=((1, 1), (0.5, 0.5), (1, 1), (2, 2), (1, 1)),
    channel_mlp_skip="linear",
)
h1, l2 = H1Loss(d=2), LpLoss(d=2)
trainer = Trainer(
    model=model, n_epochs=10, data_processor=data_processor,
    eval_interval=5, verbose=True,
)
metrics = trainer.train(
    train_loader, test_loaders, adamw(3e-3), training_loss=h1,
    eval_losses={"h1": h1, "l2": l2},
)
print({k: round(v, 5) for k, v in metrics.items()})
