"""SegFormer (MiT encoder + all-MLP head) — TPU-native JAX implementation.

Replaces the reference's ``transformers`` SegFormer-b0
(/root/reference/nesr/nesr.py:291-301, nvidia/segformer-b0-finetuned-ade-512-512)
for segmentation-guided enhancement. Inference contract mirrors the
reference's usage (:704-724): resize so the long side is <=1024 (model input
512x512 via the feature extractor), forward, argmax over 150 ADE20k classes,
nearest-resize the class map back.

Architecture (published SegFormer design): 4 stages of overlap patch
embedding + efficient self-attention (spatial-reduction attention) + Mix-FFN
(depthwise 3x3 inside the MLP), all-MLP decode head at 1/4 resolution.
Parameters are a flat dict keyed by HF transformers state-dict names, so the
published checkpoint converts mechanically (models/diffusion/convert.py
rules).
"""

from __future__ import annotations

import functools
import logging
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
    attention, layer_norm, linear)

logger = logging.getLogger("nesr.segformer")

__all__ = ["SegFormerConfig", "segformer_logits", "SegFormerModel",
           "load_segformer", "segformer_param_shapes"]


class SegFormerConfig:
    """Static config (defaults = SegFormer-b0, ADE20k)."""

    def __init__(self, num_channels=3, num_encoder_blocks=4,
                 depths=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1),
                 hidden_sizes=(32, 64, 160, 256),
                 patch_sizes=(7, 3, 3, 3), strides=(4, 2, 2, 2),
                 num_attention_heads=(1, 2, 5, 8), mlp_ratios=(4, 4, 4, 4),
                 decoder_hidden_size=256, num_labels=150,
                 layer_norm_eps=1e-6, **_ignored):
        self.num_channels = num_channels
        self.num_encoder_blocks = num_encoder_blocks
        self.depths = tuple(depths)
        self.sr_ratios = tuple(sr_ratios)
        self.hidden_sizes = tuple(hidden_sizes)
        self.patch_sizes = tuple(patch_sizes)
        self.strides = tuple(strides)
        self.num_attention_heads = tuple(num_attention_heads)
        self.mlp_ratios = tuple(mlp_ratios)
        self.decoder_hidden_size = decoder_hidden_size
        self.num_labels = num_labels
        self.layer_norm_eps = layer_norm_eps

    def _key(self):
        return (self.num_channels, self.num_encoder_blocks, self.depths,
                self.sr_ratios, self.hidden_sizes, self.patch_sizes,
                self.strides, self.num_attention_heads, self.mlp_ratios,
                self.decoder_hidden_size, self.num_labels,
                self.layer_norm_eps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, SegFormerConfig)
                and self._key() == other._key())


def _conv(params, name, x, stride, padding, dtype):
    w = params[f"{name}.weight"].astype(dtype)
    y = lax.conv_general_dilated(
        x.astype(dtype), w, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    b = params.get(f"{name}.bias")
    return y + b.astype(jnp.float32) if b is not None else y


def _dwconv(params, name, x, dtype):
    c = x.shape[-1]
    w = params[f"{name}.weight"].astype(dtype)  # (3, 3, 1, c) after convert
    y = lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32)
    return y + params[f"{name}.bias"].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def segformer_logits(params: dict, pixel_values: jax.Array,
                     cfg: SegFormerConfig,
                     compute_dtype: str = "bfloat16") -> jax.Array:
    """pixel_values: (N, H, W, 3), ImageNet-normalised.

    Returns logits (N, H/4, W/4, num_labels).
    """
    dtype = jnp.dtype(compute_dtype)
    eps = cfg.layer_norm_eps
    n = pixel_values.shape[0]
    x = pixel_values
    features = []

    for si in range(cfg.num_encoder_blocks):
        # Overlap patch embedding
        name = f"segformer.encoder.patch_embeddings.{si}.proj"
        x = _conv(params, name, x, cfg.strides[si],
                  cfg.patch_sizes[si] // 2, dtype)
        h, w, c = x.shape[1], x.shape[2], x.shape[3]
        seq = x.reshape(n, h * w, c)
        seq = layer_norm(seq, params,
                         f"segformer.encoder.patch_embeddings.{si}"
                         ".layer_norm", eps)

        heads = cfg.num_attention_heads[si]
        sr = cfg.sr_ratios[si]
        for li in range(cfg.depths[si]):
            base = f"segformer.encoder.block.{si}.{li}"
            # --- efficient self-attention ---
            hn = layer_norm(seq, params, f"{base}.layer_norm_1", eps)
            q = linear(hn, params, f"{base}.attention.self.query",
                       dtype=dtype)
            if sr > 1:
                red = hn.reshape(n, h, w, c)
                red = _conv(params, f"{base}.attention.self.sr", red, sr, 0,
                            dtype)
                red = red.reshape(n, -1, c)
                red = layer_norm(red, params,
                                 f"{base}.attention.self.layer_norm", eps)
            else:
                red = hn
            k = linear(red, params, f"{base}.attention.self.key", dtype=dtype)
            v = linear(red, params, f"{base}.attention.self.value",
                       dtype=dtype)
            att = attention(q, k, v, heads, dtype=dtype)
            att = linear(att, params, f"{base}.attention.output.dense",
                         dtype=dtype)
            seq = seq + att
            # --- Mix-FFN ---
            hn = layer_norm(seq, params, f"{base}.layer_norm_2", eps)
            hn = linear(hn, params, f"{base}.mlp.dense1", dtype=dtype)
            hn = hn.reshape(n, h, w, -1)
            hn = _dwconv(params, f"{base}.mlp.dwconv.dwconv", hn, dtype)
            hn = jax.nn.gelu(hn.reshape(n, h * w, -1), approximate=False)
            hn = linear(hn, params, f"{base}.mlp.dense2", dtype=dtype)
            seq = seq + hn

        seq = layer_norm(seq, params, f"segformer.encoder.layer_norm.{si}",
                         eps)
        x = seq.reshape(n, h, w, c)
        features.append(x)

    # All-MLP decode head: project each stage to decoder_hidden_size,
    # bilinear-resize to 1/4 scale, concat (reversed), fuse, classify.
    target_h, target_w = features[0].shape[1], features[0].shape[2]
    projected = []
    for si, feat in enumerate(features):
        p = linear(feat, params, f"decode_head.linear_c.{si}.proj",
                   dtype=dtype)
        if p.shape[1] != target_h or p.shape[2] != target_w:
            p = jax.image.resize(p, (n, target_h, target_w, p.shape[-1]),
                                 method="bilinear")
        projected.append(p)
    fused = jnp.concatenate(list(reversed(projected)), axis=-1)
    fused = _conv(params, "decode_head.linear_fuse", fused, 1, 0, dtype)
    # BatchNorm (inference): folded running stats
    mean = params["decode_head.batch_norm.running_mean"]
    var = params["decode_head.batch_norm.running_var"]
    gamma = params["decode_head.batch_norm.weight"]
    beta = params["decode_head.batch_norm.bias"]
    fused = (fused - mean) * lax.rsqrt(var + 1e-5) * gamma + beta
    fused = jax.nn.relu(fused)
    logits = _conv(params, "decode_head.classifier", fused, 1, 0, dtype)
    return logits.astype(jnp.float32)


# ------------------------------------------------------------ param spec ----

def segformer_param_shapes(cfg: SegFormerConfig) -> dict[str, tuple]:
    spec: dict[str, tuple] = {}

    def norm(name, c):
        spec[f"{name}.weight"] = (c,)
        spec[f"{name}.bias"] = (c,)

    def lin(name, cin, cout):
        spec[f"{name}.weight"] = (cin, cout)
        spec[f"{name}.bias"] = (cout,)

    cin = cfg.num_channels
    for si in range(cfg.num_encoder_blocks):
        c = cfg.hidden_sizes[si]
        k = cfg.patch_sizes[si]
        spec[f"segformer.encoder.patch_embeddings.{si}.proj.weight"] = \
            (k, k, cin, c)
        spec[f"segformer.encoder.patch_embeddings.{si}.proj.bias"] = (c,)
        norm(f"segformer.encoder.patch_embeddings.{si}.layer_norm", c)
        for li in range(cfg.depths[si]):
            base = f"segformer.encoder.block.{si}.{li}"
            norm(f"{base}.layer_norm_1", c)
            lin(f"{base}.attention.self.query", c, c)
            if cfg.sr_ratios[si] > 1:
                sr = cfg.sr_ratios[si]
                spec[f"{base}.attention.self.sr.weight"] = (sr, sr, c, c)
                spec[f"{base}.attention.self.sr.bias"] = (c,)
                norm(f"{base}.attention.self.layer_norm", c)
            lin(f"{base}.attention.self.key", c, c)
            lin(f"{base}.attention.self.value", c, c)
            lin(f"{base}.attention.output.dense", c, c)
            norm(f"{base}.layer_norm_2", c)
            mlp_dim = c * cfg.mlp_ratios[si]
            lin(f"{base}.mlp.dense1", c, mlp_dim)
            spec[f"{base}.mlp.dwconv.dwconv.weight"] = (3, 3, 1, mlp_dim)
            spec[f"{base}.mlp.dwconv.dwconv.bias"] = (mlp_dim,)
            lin(f"{base}.mlp.dense2", mlp_dim, c)
        norm(f"segformer.encoder.layer_norm.{si}", c)
        cin = c

    d = cfg.decoder_hidden_size
    for si in range(cfg.num_encoder_blocks):
        lin(f"decode_head.linear_c.{si}.proj", cfg.hidden_sizes[si], d)
    spec["decode_head.linear_fuse.weight"] = \
        (1, 1, d * cfg.num_encoder_blocks, d)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        spec[f"decode_head.batch_norm.{stat}"] = (d,)
    spec["decode_head.classifier.weight"] = (1, 1, d, cfg.num_labels)
    spec["decode_head.classifier.bias"] = (cfg.num_labels,)
    return spec


# -------------------------------------------------------------- wrapper -----

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SegFormerModel:
    """Host-facing wrapper matching the reference's inference protocol
    (_segment_and_enhance, nesr.py:691-724)."""

    def __init__(self, params: dict, cfg: SegFormerConfig,
                 compute_dtype: str = "bfloat16", input_size: int = 512):
        self.params = params
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.input_size = input_size

    def segment(self, image: np.ndarray) -> np.ndarray:
        """RGB uint8 (H, W, 3) -> int32 class map at the input resolution
        capped to 1024 px (the reference's cap, nesr.py:704-709)."""
        from neural_enhanced_super_resolution_tpu.ops.resize import resize

        h, w = image.shape[:2]
        max_size = 1024
        if max(h, w) > max_size:
            scale = max_size / max(h, w)
            image = np.asarray(resize(image, dsize=(int(w * scale),
                                                    int(h * scale)),
                                      interpolation="lanczos4"))
        # feature extractor: resize to 512x512, ImageNet normalise
        net_in = np.asarray(resize(image, dsize=(self.input_size,
                                                 self.input_size),
                                   interpolation="bilinear"))
        x = (net_in.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / \
            _IMAGENET_STD
        logits = segformer_logits(self.params, jnp.asarray(x)[None],
                                  self.cfg, self.compute_dtype)
        seg = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        seg = np.asarray(seg)
        # nearest-resize back to the (capped) image size
        out = np.asarray(resize(seg.astype(np.uint8),
                                dsize=(image.shape[1], image.shape[0]),
                                interpolation="nearest"))
        return out.astype(np.int32)


def load_segformer(path: str | None = None,
                   compute_dtype: str = "bfloat16") -> SegFormerModel:
    """Load a HF-layout SegFormer snapshot (config.json + weights)."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
        convert_state_dict, read_json)

    if path is None:
        from neural_enhanced_super_resolution_tpu.utils.downloader import (
            get_model_path)
        path = get_model_path("segmentation")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"segformer snapshot not found at {path}")

    cfg = SegFormerConfig(**read_json(os.path.join(path, "config.json")))
    for fname in ("model.safetensors", "pytorch_model.bin"):
        full = os.path.join(path, fname)
        if os.path.exists(full):
            if fname.endswith(".safetensors"):
                from safetensors.numpy import load_file
                sd = dict(load_file(full))
            else:
                import torch
                sd = {k: v.numpy() for k, v in torch.load(
                    full, map_location="cpu", weights_only=True).items()}
            break
    else:
        raise FileNotFoundError(f"no weights in {path}")
    # depthwise (C,1,3,3) weights map to HWIO (3,3,1,C) via the
    # generic OIHW->HWIO transpose; no special-casing needed.
    params = convert_state_dict(sd)
    return SegFormerModel(params, cfg, compute_dtype)

