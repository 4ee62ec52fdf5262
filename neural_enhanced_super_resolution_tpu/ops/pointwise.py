"""Saturating pointwise ops with OpenCV uint8 semantics.

Building blocks for the reference's composite enhancements: unsharp masking via
``cv2.addWeighted(img, 1.5, blur, -0.5, 0)`` (/root/reference/nesr/nesr.py:740,
:1069), the detail mask via ``cv2.subtract`` + ``convertScaleAbs`` + binary
``threshold`` (:1063-1072). Everything is elementwise — XLA fuses these into
neighboring convs for free.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["add_weighted", "subtract", "convert_scale_abs", "threshold_binary"]


def _saturate_like(y, ref_dtype):
    if jnp.issubdtype(ref_dtype, jnp.integer):
        info = jnp.iinfo(ref_dtype)
        return jnp.clip(jnp.round(y), info.min, info.max).astype(ref_dtype)
    return y.astype(ref_dtype)


def add_weighted(a, alpha: float, b, beta: float, gamma: float = 0.0):
    """cv2.addWeighted: saturate(a*alpha + b*beta + gamma)."""
    a = jnp.asarray(a)
    y = a.astype(jnp.float32) * alpha + jnp.asarray(b).astype(jnp.float32) * beta + gamma
    return _saturate_like(y, a.dtype)


def subtract(a, b):
    """cv2.subtract: saturating subtraction (uint8 clamps at 0)."""
    a = jnp.asarray(a)
    y = a.astype(jnp.float32) - jnp.asarray(b).astype(jnp.float32)
    return _saturate_like(y, a.dtype)


def convert_scale_abs(x, alpha: float = 1.0, beta: float = 0.0):
    """cv2.convertScaleAbs: saturate_cast<uint8>(|x*alpha + beta|)."""
    y = jnp.abs(jnp.asarray(x).astype(jnp.float32) * alpha + beta)
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def threshold_binary(x, thresh: float, maxval: float = 255.0):
    """cv2.threshold(..., THRESH_BINARY): maxval where x > thresh else 0."""
    x = jnp.asarray(x)
    y = jnp.where(x.astype(jnp.float32) > thresh, maxval, 0.0)
    return _saturate_like(y, x.dtype)
