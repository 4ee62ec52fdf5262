"""Checkpoint conversion: PyTorch ``.pth`` / safetensors -> JAX pytrees.

The reference loads ``RealESRGAN_x2plus.pth`` via RealESRGANer
(/root/reference/nesr/nesr.py:220-229); those checkpoints store the state dict
under ``params_ema`` (preferred) or ``params``. Torch conv weights are OIHW;
our NHWC models use HWIO, so kernels transpose (2, 3, 1, 0).
"""

from __future__ import annotations

import io
import logging
import os
import zipfile
from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

logger = logging.getLogger("nesr.weights")

__all__ = ["load_state_dict", "rrdbnet_params_from_state_dict",
           "rrdbnet_state_dict_keys", "rrdbnet_state_dict_from_params",
           "save_state_dict"]


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch ``.pth``/``.pt`` or ``.safetensors`` file as numpy arrays.

    Torch checkpoints are loaded with ``torch.load(map_location='cpu')``
    (torch is a host-side dependency only — nothing from it touches the TPU
    compute path). Unwraps ``params_ema``/``params``/``state_dict`` containers.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch  # host-side IO only
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for container_key in ("params_ema", "params", "state_dict"):
            if container_key in obj and isinstance(obj[container_key], dict):
                obj = obj[container_key]
                break
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in obj.items()}


def _conv_from_torch(sd: Mapping[str, np.ndarray], name: str) -> dict[str, Any]:
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype=jnp.float32),
            "b": jnp.asarray(b, dtype=jnp.float32)}


def rrdbnet_state_dict_keys(num_block: int = 23) -> list[str]:
    """All parameter names of a basicsr-layout RRDBNet state dict."""
    names = ["conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr",
             "conv_last"]
    keys = []
    for n in names:
        keys += [f"{n}.weight", f"{n}.bias"]
    for i in range(num_block):
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for ci in range(1, 6):
                keys += [f"body.{i}.{rdb}.conv{ci}.weight",
                         f"body.{i}.{rdb}.conv{ci}.bias"]
    return keys


def rrdbnet_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                   num_block: int = 23) -> dict[str, Any]:
    """Convert a basicsr RRDBNet state dict to our scan-stacked pytree.

    The 23 body blocks are stacked on a leading axis (models/rrdbnet.py drives
    them with lax.scan).
    """
    params: dict[str, Any] = {
        name: _conv_from_torch(sd, name)
        for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                     "conv_hr", "conv_last")
    }
    body: dict[str, Any] = {}
    for rdb in ("rdb1", "rdb2", "rdb3"):
        convs = {}
        for ci in range(1, 6):
            ws, bs = [], []
            for i in range(num_block):
                p = _conv_from_torch(sd, f"body.{i}.{rdb}.conv{ci}")
                ws.append(p["w"])
                bs.append(p["b"])
            convs[f"conv{ci}"] = {"w": jnp.stack(ws), "b": jnp.stack(bs)}
        body[rdb] = convs
    params["body"] = body
    return params


def rrdbnet_state_dict_from_params(params, num_block: int | None = None
                                   ) -> dict[str, np.ndarray]:
    """Inverse of rrdbnet_params_from_state_dict: our stacked pytree back to
    basicsr-layout numpy tensors (OIHW). Enables exporting JAX-trained
    checkpoints in the format every Real-ESRGAN tool understands."""
    sd: dict[str, np.ndarray] = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        sd[f"{name}.weight"] = np.asarray(
            params[name]["w"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(params[name]["b"])
    body = params["body"]
    if "w0" in body.get("rdb1", {}):
        raise ValueError("params are in fused layout; export the stock "
                         "layout (fuse_rrdbnet_params is one-way)")
    nb = num_block or body["rdb1"]["conv1"]["w"].shape[0]
    for i in range(nb):
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for ci in range(1, 6):
                p = body[rdb][f"conv{ci}"]
                sd[f"body.{i}.{rdb}.conv{ci}.weight"] = np.asarray(
                    p["w"][i]).transpose(3, 2, 0, 1)
                sd[f"body.{i}.{rdb}.conv{ci}.bias"] = np.asarray(p["b"][i])
    return sd


def save_state_dict(sd: Mapping[str, np.ndarray], path: str) -> str:
    """Save a numpy state dict as .safetensors or torch .pth."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    else:
        import torch
        torch.save({"params_ema": {k: torch.from_numpy(
            np.ascontiguousarray(v)) for k, v in sd.items()}}, path)
    return path
