from .base_model import (  # noqa: F401
    available_models,
    from_checkpoint,
    get_model,
    get_model_class,
    load_checkpoint,
    register_model,
    save_checkpoint,
)
from .fno import FNO, TFNO, partialclass  # noqa: F401
from .uno import UNO  # noqa: F401
from .uqno import UQNO  # noqa: F401
from .sfno import SFNO  # noqa: F401
from .gino import GINO  # noqa: F401
from .fnogno import FNOGNO  # noqa: F401
from .local_no import LocalNO  # noqa: F401
from .rno import RNO  # noqa: F401
from .otno import OTNO  # noqa: F401
from .codano import CODANO, extend_variable_ids  # noqa: F401
