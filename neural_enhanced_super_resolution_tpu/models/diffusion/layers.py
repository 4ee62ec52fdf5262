"""Shared neural building blocks for the diffusion stack (NHWC, pure JAX).

Parameters are flat dicts keyed by the *diffusers state-dict names* (e.g.
``down_blocks.0.resnets.1.conv1.weight``) with tensors already converted to
JAX layouts (conv HWIO, linear (in, out)). This makes checkpoint conversion a
mechanical per-tensor transpose (models/diffusion/convert.py) and keeps the
forward code free of bespoke pytree plumbing.

All matmuls take ``preferred_element_type=float32`` so bf16 compute
accumulates in f32 on the MXU.
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "linear", "group_norm", "layer_norm", "silu",
           "attention", "timestep_embedding", "nearest_upsample_x2"]

# Profiling-only ablation switches (benchmarks/profile_sd_step.py): each
# named component ("groupnorm", "selfattn", "selfattn_core", "crossattn",
# "crossattn_core", "ff", "cfg") becomes a cheap passthrough so slope-timed
# step rates
# decompose the denoise step (VERDICT round 3 #4b). "crossattn_core" keeps
# the layer-norm + q/k/v/out projections and ablates only the attention
# einsums, splitting the crossattn share. Read at TRACE time; unset in
# production — the default frozenset() compiles identical programs.
SD_ABLATE = frozenset(
    t for t in os.environ.get("NESR_SD_ABLATE", "").split(",") if t)


def conv2d(x: jax.Array, params: dict, name: str, stride: int = 1,
           padding: int = 1, dtype=jnp.bfloat16) -> jax.Array:
    """3x3/1x1 conv, NHWC, weights at f"{name}.weight" (HWIO)."""
    w = params[f"{name}.weight"].astype(dtype)
    pad = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x.astype(dtype), w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    b = params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def linear(x: jax.Array, params: dict, name: str,
           dtype=jnp.bfloat16) -> jax.Array:
    w = params[f"{name}.weight"].astype(dtype)  # (in, out)
    y = jnp.einsum("...i,io->...o", x.astype(dtype), w,
                   preferred_element_type=jnp.float32)
    b = params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def group_norm(x: jax.Array, params: dict, name: str, num_groups: int = 32,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the channel (last) axis of NHWC."""
    if "groupnorm" in SD_ABLATE:  # profiling ablation: scale/shift only
        # The barrier keeps the ablated program's fusion boundaries where
        # the real GroupNorm's reductions put them: without it XLA re-fuses
        # the bare scale/shift into neighbouring producers — including into
        # the flash-attention kernel's operands, which blows its scoped-VMEM
        # budget at 128^2 latents (the round-4 "ablation fails to compile"
        # hole, RESULTS.md). Measured share = reductions only, as intended.
        y = x.astype(jnp.float32) * params[f"{name}.weight"] + \
            params[f"{name}.bias"]
        return lax.optimization_barrier(y)
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * lax.rsqrt(var + eps)
    x32 = x32.reshape(n, h, w, c)
    return x32 * params[f"{name}.weight"] + params[f"{name}.bias"]


def layer_norm(x: jax.Array, params: dict, name: str,
               eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y * params[f"{name}.weight"] + params[f"{name}.bias"]


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
              mask: jax.Array | None = None,
              dtype=jnp.bfloat16) -> jax.Array:
    """Multi-head attention over (B, Sq, D) x (B, Skv, D).

    Plain XLA formulation (einsum + softmax); the Pallas flash-attention
    kernel in kernels/attention.py replaces this on TPU for long sequences.
    """
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).astype(dtype)
    kh = k.reshape(b, skv, num_heads, hd).astype(dtype)
    vh = v.reshape(b, skv, num_heads, hd).astype(dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, sq, d)


def attention_qmajor(q: jax.Array, k: jax.Array, v: jax.Array,
                     num_heads: int, mask: jax.Array | None = None,
                     dtype=jnp.bfloat16) -> jax.Array:
    """Head-last ("q-major") attention: scores bqhd,bkhd->bqhk.

    Keeps the big q tensor in its natural (B, Sq, H, d) layout end to end —
    no transpose into and out of head-major — at the cost of a softmax over
    a non-minor axis. A/B'd against the bhqk form on the UNet's
    cross-attention shapes (skv=77): benchmarks/envelope_crossattn.py.
    """
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).astype(dtype)
    kh = k.reshape(b, skv, num_heads, hd).astype(dtype)
    vh = v.reshape(b, skv, num_heads, hd).astype(dtype)
    scores = jnp.einsum("bqhd,bkhd->bqhk", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    if mask is not None:
        # mask arrives in the bhqk convention (..., heads, q, k); scores
        # here are (..., q, heads, k) — swap the two middle axes.
        scores = scores + jnp.swapaxes(mask, -3, -2)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bqhk,bkhd->bqhd", probs.astype(dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, sq, d)


# Cross-attention formulation switch (trace-time, like SD_ABLATE): the
# skv=77 text-context attention is too skinny for the flash kernel, so it
# runs one of the XLA formulations above. Default = qmajor, the measured
# in-context winner (+10.5% on the whole UNet step: 34.69 vs 31.40 steps/s,
# spreads ~0.7 — RESULTS.md round-4 cross-attention record); bhqk stays
# available for A/B via NESR_CROSSATTN=bhqk.
CROSSATTN_FORMS = {"bhqk": attention, "qmajor": attention_qmajor}
cross_attention = CROSSATTN_FORMS[
    os.environ.get("NESR_CROSSATTN", "qmajor")]


def timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / \
        (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def nearest_upsample_x2(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
