"""Training metrics/observability: local JSONL always, WandB when available.

Parity surface (reference train.py:29-33, :145-153, :181-191): scalar
``train/loss`` + ``train/log_loss`` every ``iters_per_logging``, epoch
aggregates, generated audio per checkpoint.  The reference hard-depends on
wandb; here wandb is optional (not in the base image) — every metric also
lands in ``exp/<run>/metrics.jsonl`` so runs are inspectable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, wandb_cfg: Optional[Dict[str, Any]] = None,
                 run_config: Optional[Dict[str, Any]] = None,
                 enabled: bool = True):
        """``enabled=False`` makes every method a no-op — non-zero processes
        in a multi-host run (the reference's rank-0-only wandb/writes,
        reference train.py:29-33, 156-186)."""
        self._enabled = enabled
        self._wandb = None
        if not enabled:
            self._f = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self._path, "a")
        mode = (wandb_cfg or {}).get("mode", "disabled")
        if wandb_cfg and mode != "disabled":
            try:
                import wandb
                kwargs = {k: v for k, v in wandb_cfg.items() if v is not None}
                self._wandb = wandb
                wandb.init(config=run_config, **kwargs)
            except ImportError:
                print("wandb requested but not installed; JSONL logging only")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self._enabled:
            return
        rec = {"step": int(step), "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_audio(self, samples, sample_rate: int, step: int) -> None:
        if self._wandb is not None:
            audio = [self._wandb.Audio(s.squeeze(), sample_rate=sample_rate)
                     for s in samples]
            self._wandb.log({"inference/audio": audio}, step=step)

    def finish(self) -> None:
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
