"""Checkpoint save/load/average with the reference on-disk contract.

Files are ``exp/<run>/checkpoint/<iter>.pkl`` (reference train.py:156-161)
holding ``{'model_state_dict': <pytree of numpy arrays>,
'optimizer_state_dict': ..., 'step': int}``.  ``ckpt_iter`` resolution
('max' | int | -1) matches reference train.py:94-115.

Two loaders:
- native pickles written by this framework;
- reference torch ``.pkl`` checkpoints (a torch ``state_dict``), converted on
  the fly through utils.torch_compat so pretrained reference models can be
  sampled from directly.

Checkpoint averaging (``smooth``) reimplements the reference's experimental
``smooth_ckpt`` (utils.py:47-74): arithmetic mean over the (min, max] window.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..utils.exp import find_max_epoch


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, step: int, params, opt_state=None) -> str:
    os.makedirs(directory, mode=0o775, exist_ok=True)
    path = os.path.join(directory, f"{step}.pkl")
    payload: Dict[str, Any] = {
        "model_state_dict": _to_numpy(params),
        "step": int(step),
        "format": "diffwave_sashimi_tpu.v1",
    }
    if opt_state is not None:
        payload["optimizer_state_dict"] = _to_numpy(opt_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def _load_raw(path: str) -> Dict[str, Any]:
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        # Possibly a torch checkpoint (zipfile serialization)
        import torch
        ck = torch.load(path, map_location="cpu", weights_only=True)
        return {"model_state_dict": ck["model_state_dict"],
                "optimizer_state_dict": ck.get("optimizer_state_dict"),
                "format": "torch"}


def _is_torch_state_dict(sd) -> bool:
    if not hasattr(sd, "keys"):
        return False
    keys = list(sd.keys())
    return bool(keys) and all(isinstance(k, str) for k in keys) and any(
        "." in k for k in keys)


def load_checkpoint(directory: str, ckpt_iter, model_cfg=None
                    ) -> Optional[Dict[str, Any]]:
    """Resolve ``ckpt_iter`` and load.  Returns None if no valid checkpoint.

    If the file is a reference torch checkpoint, ``model_cfg`` is required to
    convert the state_dict into this framework's param tree.
    """
    if ckpt_iter == "max":
        ckpt_iter = find_max_epoch(directory)
    ckpt_iter = int(ckpt_iter)
    if ckpt_iter < 0:
        return None
    path = os.path.join(directory, f"{ckpt_iter}.pkl")
    if not os.path.exists(path):
        return None
    payload = _load_raw(path)
    payload["step"] = payload.get("step", ckpt_iter)

    sd = payload["model_state_dict"]
    if payload.get("format") == "torch" or _is_torch_state_dict(sd):
        assert model_cfg is not None, \
            "model_cfg needed to convert a reference torch checkpoint"
        payload["model_state_dict"] = params_from_torch_sd(sd, model_cfg)
        payload["optimizer_state_dict"] = None  # torch Adam state not portable
        payload["format"] = "torch-converted"
    return payload


def params_from_torch_sd(sd, model_cfg):
    from ..utils.torch_compat import wavenet_from_torch, sashimi_from_torch
    name = model_cfg["_name_"]
    conditional = not model_cfg.get("unconditional", True)
    if name == "wavenet":
        p = wavenet_from_torch(sd, int(model_cfg["num_res_layers"]),
                               conditional=conditional)
    elif name == "sashimi":
        p = sashimi_from_torch(sd, int(model_cfg["n_layers"]),
                               list(model_cfg["pool"]),
                               unet=bool(model_cfg.get("unet", True)),
                               conditional=conditional)
    else:
        raise ValueError(name)
    return {"params": p}


def smooth_checkpoints(directory: str, min_ckpt: int, max_ckpt: int,
                       model_cfg=None) -> Dict[str, Any]:
    """Arithmetic average of model params over iterations in (min, max]."""
    iters = sorted(
        int(f[:-4]) for f in os.listdir(directory)
        if f.endswith(".pkl") and f[:-4].isdigit()
        and min_ckpt < int(f[:-4]) <= max_ckpt)
    if not iters:
        raise FileNotFoundError(
            f"no checkpoints in ({min_ckpt}, {max_ckpt}] under {directory}")
    avg = None
    for n, it in enumerate(iters):
        ck = load_checkpoint(directory, it, model_cfg)
        p = ck["model_state_dict"]
        if avg is None:
            avg = p
        else:
            avg = jax.tree.map(
                lambda a, b, n=n: (a * n + b) / (n + 1), avg, p)
    return {"model_state_dict": avg, "step": iters[-1],
            "smoothed_over": iters}
