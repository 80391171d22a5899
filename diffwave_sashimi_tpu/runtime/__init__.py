from .train import train, make_train_step
from .generate import (generate, precompute_kernels, apply_with_kernels, resolve_condition)
from .checkpoint import (save_checkpoint, load_checkpoint,
                         smooth_checkpoints, params_from_torch_sd)
from .metrics import MetricsLogger
