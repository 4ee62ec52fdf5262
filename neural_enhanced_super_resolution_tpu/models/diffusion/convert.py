"""diffusers/transformers checkpoint -> flat JAX params conversion.

Layout rules (see layers.py): conv kernels OIHW -> HWIO, linear weights
(out, in) -> (in, out), embeddings and 1-D norm tensors pass through. Keyed by
the original state-dict names so any diffusers-era checkpoint of the supported
architectures loads without a mapping table.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

import numpy as np
import jax.numpy as jnp

__all__ = ["convert_state_dict", "load_component", "read_json"]

_EMBEDDING_MARKERS = ("token_embedding", "position_embedding",
                      "class_embedding", "position_ids")

# Deprecated diffusers AttentionBlock names (pre-0.15 checkpoints, e.g. the
# published stable-diffusion-x4-upscaler VAE) -> the to_q/to_k/to_v/to_out.0
# names vae.py looks up. diffusers renames these at load time; we must too,
# or attention params silently go missing (ADVICE.md round 1, medium).
_DEPRECATED_ATTN = {".query.": ".to_q.", ".key.": ".to_k.",
                    ".value.": ".to_v.", ".proj_attn.": ".to_out.0."}


def _canonicalize_attn(name: str, arr: np.ndarray) -> tuple[str, np.ndarray]:
    if ".attentions." not in name:
        # Only diffusers AttentionBlock paths (mid_block.attentions.N.*) use
        # the deprecated names; HF-transformers models (e.g. SegFormer's
        # attention.self.query) use query/key/value as their CURRENT names.
        return name, arr
    for old, new in _DEPRECATED_ATTN.items():
        if old in name:
            name = name.replace(old, new)
            # Oldest checkpoints store these projections as 1x1 convs;
            # squeeze to 2-D so the linear-weight transpose rule applies.
            if arr.ndim == 4 and arr.shape[2] == arr.shape[3] == 1:
                arr = arr[:, :, 0, 0]
            break
    return name, arr


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Convert a torch state dict (numpy values) to flat JAX params."""
    out = {}
    for name, val in sd.items():
        if name.endswith("position_ids"):
            continue  # buffer, not a parameter
        arr = np.asarray(val)
        name, arr = _canonicalize_attn(name, arr)
        if name.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif (name.endswith(".weight") and arr.ndim == 2
              and not any(m in name for m in _EMBEDDING_MARKERS)):
            arr = arr.T  # (out, in) -> (in, out)
        out[name] = jnp.asarray(arr, dtype=jnp.float32)
    return out


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _load_torch_or_safetensors(dirpath: str, names: tuple[str, ...]) -> dict:
    for fname in names:
        full = os.path.join(dirpath, fname)
        if os.path.exists(full):
            if fname.endswith(".safetensors"):
                from safetensors.numpy import load_file
                return dict(load_file(full))
            import torch  # host-side IO only
            obj = torch.load(full, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in obj.items()}
    raise FileNotFoundError(f"no weights found in {dirpath} (tried {names})")


def load_component(component_dir: str) -> tuple[dict, dict]:
    """Load (config, params) for one pipeline component directory."""
    config = read_json(os.path.join(component_dir, "config.json"))
    sd = _load_torch_or_safetensors(component_dir, (
        "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
        "model.safetensors", "pytorch_model.bin"))
    return config, convert_state_dict(sd)
