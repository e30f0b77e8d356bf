"""Training an FNO on Darcy flow.

TPU-native counterpart of the reference `plot_FNO_darcy.py`: trains a small
FNO on the 16x16 Darcy dataset in a few seconds and evaluates zero-shot
super-resolution at 32x32.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import H1Loss, LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw, step_lr
from neuraloperator_tpu.utils import count_model_params

train_loader, test_loaders, data_processor = load_darcy_flow_small(
    n_train=1000, n_tests=[100, 50], batch_size=32,
    test_batch_sizes=[32, 32], test_resolutions=[16, 32],
)

model = FNO(
    n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=32,
    projection_channel_ratio=2,
)

optimizer = adamw(
    step_lr(8e-3, step_size=15, gamma=0.5, steps_per_epoch=len(train_loader)),
    weight_decay=1e-4,
)
h1loss = H1Loss(d=2)
l2loss = LpLoss(d=2, p=2)

trainer = Trainer(
    model=model, n_epochs=20, data_processor=data_processor,
    eval_interval=5, verbose=True,
)
metrics = trainer.train(
    train_loader, test_loaders, optimizer, training_loss=h1loss,
    eval_losses={"h1": h1loss, "l2": l2loss},
)
print("parameters:", count_model_params(trainer.params))
print({k: round(v, 5) for k, v in metrics.items()})

try:
    import matplotlib.pyplot as plt

    batch = next(iter(test_loaders[32]))
    import jax.numpy as jnp

    sample = data_processor.preprocess(
        {k: jnp.asarray(v) for k, v in batch.items()}, train=False
    )
    out = model.apply({"params": trainer.params}, sample["x"])
    out, _ = data_processor.postprocess(out, sample, train=False)
    fig, axs = plt.subplots(1, 3, figsize=(9, 3))
    axs[0].imshow(np.asarray(batch["x"])[0, 0]); axs[0].set_title("input")
    axs[1].imshow(np.asarray(batch["y"])[0, 0]); axs[1].set_title("truth")
    axs[2].imshow(np.asarray(out)[0, 0]); axs[2].set_title("prediction")
    fig.savefig("fno_darcy.png", dpi=100)
    print("saved fno_darcy.png")
except ImportError:
    pass
