"""Log in to Weights & Biases using the configured API key.

Counterpart of /root/reference/scripts/login_wandb.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from neuraloperator_tpu.utils import wandb_login

wandb_login()
