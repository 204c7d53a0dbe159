from cips3d_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_pytree,
    load_pytree_like,
    save_pytree,
)
from cips3d_tpu.utils.textlogger import TextLogger, plot_logs, read_log  # noqa: F401
