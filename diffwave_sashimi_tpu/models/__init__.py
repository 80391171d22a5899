"""Model registry: string name -> backbone module.

Parity with the reference registry (models/__init__.py:4-23): the ``_name_``
key of the model config selects the class; remaining keys are constructor
kwargs.  Unknown/extra config keys the constructors don't take are dropped
(matching the reference's ``**kwargs`` swallowing).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .wavenet import WaveNet


def _registry():
    reg = {"wavenet": WaveNet}
    try:
        from .sashimi import Sashimi  # deferred: pulls in the S4 ops stack
        reg["sashimi"] = Sashimi
    except ImportError:
        pass
    return reg

_DTYPES = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
           "f32": jnp.float32, "float32": jnp.float32}


def construct_model(model_cfg: Dict[str, Any], precision: str = "f32",
                    remat: bool = False):
    """Build the backbone module from a model config block."""
    cfg = dict(model_cfg)
    name = cfg.pop("_name_")
    cls = _registry()[name]
    fields = set(cls.__dataclass_fields__.keys())
    kwargs = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in fields}
    kwargs["dtype"] = _DTYPES[precision]
    kwargs["remat"] = remat
    return cls(**kwargs)
