"""Experiment-store naming and checkpoint discovery.

The on-disk contract matches the reference exactly (reference: utils.py:96-116
``local_directory`` and utils.py:23-45 ``find_max_epoch``):

  exp/<name>_<model_id>_T<T>_betaT<beta_T>[_L<len>_hop<hop>]_{uncond,cond}/
      checkpoint/<iter>.pkl
      waveforms/<iter>/<iter//1000>k_<i>.wav

so runs produced by this framework land next to (and are comparable with)
reference runs.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def model_identifier(model_cfg) -> str:
    """Run-name fragment per backbone.

    Matches the reference naming (reference: models/sashimi.py:318-327 and the
    intended behavior of models/wavenet.py:215-220 — the reference WaveNet
    version has a NameError bug referencing ``model_cfg`` instead of its arg;
    we implement what it meant to do, producing the names seen in exp/).
    """
    name = model_cfg["_name_"]
    if name == "wavenet":
        return "wnet_h{}_d{}".format(
            model_cfg["res_channels"], model_cfg["num_res_layers"])
    elif name == "sashimi":
        return "{}_d{}_n{}_pool_{}_expand{}_ff{}".format(
            "unet" if model_cfg["unet"] else "snet",
            model_cfg["d_model"],
            model_cfg["n_layers"],
            len(model_cfg["pool"]),
            model_cfg["expand"],
            model_cfg["ff"],
        )
    raise ValueError(f"Unknown model name {name!r}")


def local_directory(name: Optional[str], model_cfg, diffusion_cfg, dataset_cfg,
                    output_directory: str, makedirs: bool = True
                    ) -> Tuple[str, str]:
    """Build ``(run_name, exp/<run_name>/<output_directory>)``; mkdir -p it."""
    model_name = model_identifier(model_cfg)
    diffusion_name = f"_T{diffusion_cfg['T']}_betaT{diffusion_cfg['beta_T']}"
    if model_cfg["unconditional"]:
        data_name = ""
    else:
        data_name = f"_L{dataset_cfg['segment_length']}_hop{dataset_cfg['hop_length']}"
    suffix = "uncond" if model_cfg["unconditional"] else "cond"
    local_path = model_name + diffusion_name + data_name + f"_{suffix}"
    if name:
        local_path = name + "_" + local_path

    out_dir = os.path.join("exp", local_path, output_directory)
    if makedirs:
        os.makedirs(out_dir, mode=0o775, exist_ok=True)
    return local_path, out_dir


def find_max_epoch(path: str) -> int:
    """Max ``<iter>.pkl`` iteration in ``path``; -1 if none (ref utils.py:23)."""
    if not os.path.isdir(path):
        return -1
    epoch = -1
    for f in os.listdir(path):
        if len(f) > 4 and f.endswith(".pkl"):
            try:
                epoch = max(epoch, int(f[:-4]))
            except ValueError:
                continue
    return epoch


def flatten(v):
    """Flatten a list of lists/tuples (ref utils.py:7-12)."""
    return [x for y in v for x in y]


def rescale(x):
    """Rescale an array to [0, 1] (ref utils.py:15-20)."""
    return (x - x.min()) / (x.max() - x.min())
