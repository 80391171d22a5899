"""Convert reference (torch) state_dicts into this framework's param PyTrees.

Lets users load checkpoints trained with the reference framework
(albertfgu/diffwave-sashimi ``exp/<run>/checkpoint/<iter>.pkl``, saved as
``{'model_state_dict': ...}`` at reference train.py:156-161) directly into the
TPU models, and powers the cross-implementation parity tests.

Only numpy is required here — inputs are ``{name: np.ndarray}`` mappings (call
``.numpy()`` on torch tensors first, or use :func:`load_torch_pickle`).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _wnconv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """weight-normed torch conv (weight_g/weight_v/bias) -> {v, g, b}."""
    out = {
        "v": _np(sd[prefix + ".weight_v"]),
        "g": _np(sd[prefix + ".weight_g"]).reshape(-1),
    }
    if prefix + ".bias" in sd:
        out["b"] = _np(sd[prefix + ".bias"])
    return out


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"w": _np(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["b"] = _np(sd[prefix + ".bias"])
    return out


def _mel_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Per-block mel conditioner params (upsample_conv2d.{0,1} + mel_conv)."""
    out: Dict[str, Any] = {"mel_upsampler": {}}
    for i in (0, 1):
        p = f"{prefix}.upsample_conv2d.{i}"
        out["mel_upsampler"][f"upsample{i}"] = {
            "v": _np(sd[p + ".weight_v"]),
            "g": _np(sd[p + ".weight_g"]).reshape(-1),
            "b": _np(sd[p + ".bias"]),
        }
    out["mel_conv"] = _wnconv(sd, f"{prefix}.mel_conv.conv")
    return out


def wavenet_from_torch(sd: Mapping[str, Any], num_res_layers: int,
                       conditional: bool = False) -> Dict[str, Any]:
    """Reference WaveNet state_dict -> flax params['params'] tree."""
    p: Dict[str, Any] = {}
    p["init_conv"] = _wnconv(sd, "init_conv.0.conv")
    p["fc_t1"] = _linear(sd, "residual_layer.fc_t1")
    p["fc_t2"] = _linear(sd, "residual_layer.fc_t2")
    for n in range(num_res_layers):
        rb = f"residual_layer.residual_blocks.{n}"
        blk: Dict[str, Any] = {
            "fc_t": _linear(sd, rb + ".fc_t"),
            "dilated_conv": _wnconv(sd, rb + ".dilated_conv_layer.conv"),
            "res_conv": _wnconv(sd, rb + ".res_conv"),
            "skip_conv": _wnconv(sd, rb + ".skip_conv"),
        }
        if conditional:
            blk.update(_mel_block(sd, rb))
        p[f"block{n}"] = blk
    p["final_conv1"] = _wnconv(sd, "final_conv.0.conv")
    p["final_conv2"] = {
        "w": _np(sd["final_conv.2.conv.weight"])[:, :, 0],
        "b": _np(sd["final_conv.2.conv.bias"]),
    }
    return p


def _s4_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference S4 layer (models/s4.py:1279, NPLR mode) -> our S4 params.

    The reference stores complex tensors as (..., 2) real views (_c2r); we
    keep the same convention.
    """
    kp = prefix + ".kernel.kernel"  # S4.kernel (SSKernel) .kernel (SSKernelNPLR)
    out = {
        "D": _np(sd[prefix + ".D"]),
        "kernel": {
            "C": _np(sd[kp + ".C"]),
            "B": _np(sd[kp + ".B"]),
            "P": _np(sd[kp + ".P"]),
            "inv_w_real": _np(sd[kp + ".inv_w_real"]),
            "w_imag": _np(sd[kp + ".w_imag"]),
            "log_dt": _np(sd[kp + ".log_dt"]),
        },
        # NOTE: the internal kernel length self.L / C-tilde state is a torch
        # buffer ('kernel.kernel.L'); callers must pass trained_length to the
        # model so kernel doubling matches (see models/s4.py).
    }
    # LinearActivation wraps the conv in a Sequential when an activation
    # is attached (ref models/s4.py:166-177) -> key 'output_linear.0.*'.
    # With linear=True the reference has no output transform at all.
    w = sd.get(prefix + ".output_linear.weight",
               sd.get(prefix + ".output_linear.0.weight"))
    if w is not None:
        w = _np(w)
        if w.ndim == 3:   # transposed=True: TransposedLinear (O, I, 1)
            w = w[:, :, 0]
        out["output_linear"] = {
            "w": w,
            "b": _np(sd.get(prefix + ".output_linear.bias",
                            sd.get(prefix + ".output_linear.0.bias"))),
        }
    return out


def _tln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"m": _np(sd[prefix + ".m"]), "s": _np(sd[prefix + ".s"])}


def _dwblock_from_torch(sd: Mapping[str, Any], prefix: str,
                        conditional: bool) -> Dict[str, Any]:
    blk: Dict[str, Any] = {
        "fc_t": _linear(sd, prefix + ".fc_t"),
        "norm1": _tln(sd, prefix + ".norm1"),
        "norm2": _tln(sd, prefix + ".norm2"),
        "s4": _s4_from_torch(sd, prefix + ".layer"),
        "ff1": _wnconv(sd, prefix + ".ff.ff.0.conv"),
        "ff2": _wnconv(sd, prefix + ".ff.ff.2.conv"),
    }
    if conditional:
        blk.update(_mel_block(sd, prefix))
    return blk


def stack_sashimi_blocks(p: Dict[str, Any], n_layers: int, pool,
                         unet: bool = True) -> Dict[str, Any]:
    """Per-block param layout -> block_scan layout (stacked stage params).

    ``d{si}_block{j}`` (j=0..n-1) -> ``d{si}_blocks: {block: stacked}`` etc.
    The inverse of iterating a stage's nn.scan axis.
    """
    import jax

    out = {k: v for k, v in p.items() if "_block" not in k}

    def stack(names):
        trees = [p[n] for n in names]
        return {"block": jax.tree.map(lambda *xs: np.stack(xs), *trees)}

    n_stages = len(pool)
    if unet:
        for si in range(n_stages):
            out[f"d{si}_blocks"] = stack(
                [f"d{si}_block{j}" for j in range(n_layers)])
    out["c_blocks"] = stack([f"c_block{j}" for j in range(n_layers)])
    for si in range(n_stages):
        out[f"u{si}_blocks"] = stack(
            [f"u{si}_block{j}" for j in range(n_layers)])
    return out


def sashimi_from_torch(sd: Mapping[str, Any], n_layers: int, pool,
                       unet: bool = True, conditional: bool = False,
                       block_scan: bool = True) -> Dict[str, Any]:
    """Reference Sashimi state_dict -> flax params['params'] tree.

    Layer ordering mirrors the reference ModuleLists (models/sashimi.py:
    247-269): d_layers = per pool stage [n_layers blocks if unet] + DownPool;
    c_layers = n_layers blocks; u_layers = per reversed pool [UpPool +
    n_layers blocks].
    """
    p: Dict[str, Any] = {}
    p["init_conv"] = _wnconv(sd, "init_conv.0.conv")
    p["fc_t1"] = _linear(sd, "fc_t1")
    p["fc_t2"] = _linear(sd, "fc_t2")

    i = 0
    for si, _ in enumerate(pool):
        if unet:
            for j in range(n_layers):
                p[f"d{si}_block{j}"] = _dwblock_from_torch(
                    sd, f"d_layers.{i}", conditional)
                i += 1
        p[f"down{si}"] = {"linear": _wnconv(sd, f"d_layers.{i}.linear.conv")}
        i += 1

    for j in range(n_layers):
        p[f"c_block{j}"] = _dwblock_from_torch(sd, f"c_layers.{j}", conditional)

    i = 0
    for si, _ in enumerate(pool[::-1]):
        p[f"up{si}"] = {"linear": _wnconv(sd, f"u_layers.{i}.linear.conv")}
        i += 1
        for j in range(n_layers):
            p[f"u{si}_block{j}"] = _dwblock_from_torch(
                sd, f"u_layers.{i}", conditional)
            i += 1

    p["norm"] = _tln(sd, "norm")
    p["final_conv1"] = _wnconv(sd, "final_conv.0.conv")
    p["final_conv2"] = {
        "w": _np(sd["final_conv.2.conv.weight"])[:, :, 0],
        "b": _np(sd["final_conv.2.conv.bias"]),
    }
    if block_scan:
        p = stack_sashimi_blocks(p, n_layers, pool, unet)
    return p
