"""Checkpointing and resuming FNO training."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import tempfile
from pathlib import Path

from neuraloperator_tpu.data.datasets import load_darcy_flow_small
from neuraloperator_tpu.losses import LpLoss
from neuraloperator_tpu.models import FNO
from neuraloperator_tpu.training import Trainer, adamw

train_loader, test_loaders, dp = load_darcy_flow_small(
    n_train=100, n_tests=[50], batch_size=16, test_batch_sizes=[16],
    test_resolutions=[16],
)
model = FNO(n_modes=(16, 16), in_channels=1, out_channels=1, hidden_channels=24)
l2 = LpLoss(d=2)
save_dir = Path(tempfile.mkdtemp()) / "ckpt"

trainer = Trainer(model=model, n_epochs=3, data_processor=dp, verbose=True)
trainer.train(
    train_loader, test_loaders, adamw(5e-3), training_loss=l2,
    eval_losses={"l2": l2}, save_every=1, save_dir=save_dir,
)
print("checkpoint files:", sorted(p.name for p in save_dir.iterdir()))

resumed = Trainer(model=model, n_epochs=6, data_processor=dp, verbose=True)
resumed.train(
    train_loader, test_loaders, adamw(5e-3), training_loss=l2,
    eval_losses={"l2": l2}, resume_from_dir=save_dir,
)

# The checkpoint is self-contained: alongside the weights the Trainer
# persisted the fitted normalizer statistics (data_processor.json), so
# a fresh process can evaluate WITHOUT refitting the train pipeline —
# a refit from a different split silently shifts every input by the
# stats delta, which dominates the measurement at small error levels.
from neuraloperator_tpu.data.transforms import load_data_processor

portable_dp = load_data_processor(save_dir)
sample = next(iter(test_loaders[16]))
pre = portable_dp.preprocess(dict(sample), train=False)
out = model.apply({"params": resumed.params}, pre["x"])
out, _ = portable_dp.postprocess(out, pre, train=False)
print("portable-processor eval rel l2:", float(l2(out, sample["y"])))
