from .optimizer import (  # noqa: F401
    adamw,
    apply_updates_sr,
    cosine_annealing,
    step_lr,
    stochastic_round_to,
)
from .trainer import Trainer  # noqa: F401
from .training_state import (  # noqa: F401
    load_training_state,
    load_training_state_orbax,
    save_training_state,
    save_training_state_orbax,
)
from .incremental import IncrementalFNOTrainer  # noqa: F401
from .patching import MultigridPatching2D, make_patches  # noqa: F401
from .setup import setup  # noqa: F401
from .tensor_galore import tensor_galore_adamw  # noqa: F401
from .profiling import ThroughputMeter, flops_per_fno_step, trace  # noqa: F401
from .optimizer import ema_params, reduce_on_plateau, with_ema  # noqa: F401
from .optimizer import (  # noqa: F401
    Quantized8,
    dequantize_blockwise,
    quantize_blockwise,
)
