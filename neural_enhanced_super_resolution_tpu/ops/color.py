"""Colorspace conversions matching OpenCV semantics, as pure XLA ops.

The reference converts RGB<->LAB around CLAHE (/root/reference/nesr/nesr.py:680-685),
RGB->GRAY for the adaptive-sharpening detail mask (:1062), and RGB<->BGR at every
model boundary (:851, :901, :915). All conversions here are elementwise/matmul XLA
ops that fuse into surrounding computations; uint8 semantics are validated against
cv2 goldens in tests/test_ops_color.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_to_bgr", "bgr_to_rgb", "rgb_to_gray", "rgb_to_lab", "lab_to_rgb"]

# D65 white point, sRGB primaries — the matrices OpenCV uses for Lab.
# Host numpy constants (jit constant-folds them): creating jnp arrays at
# import time would initialise the XLA backend before a multi-host caller
# can run jax.distributed.initialize (tests/test_distributed.py
# test_two_process_dcn_end_to_end caught exactly that).
_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], dtype=np.float32)
_XYZ2RGB = np.array(
    [[3.240479, -1.53715, -0.498535],
     [-0.969256, 1.875991, 0.041556],
     [0.055648, -0.204043, 1.057311]], dtype=np.float32)
_WHITE = np.array([0.950456, 1.0, 1.088754], dtype=np.float32)


def rgb_to_bgr(img: jax.Array) -> jax.Array:
    return img[..., ::-1]


def bgr_to_rgb(img: jax.Array) -> jax.Array:
    return img[..., ::-1]


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """cv2.COLOR_RGB2GRAY: Y = 0.299 R + 0.587 G + 0.114 B (uint8 rounds)."""
    x = img.astype(jnp.float32)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(y), 0, 255).astype(img.dtype)
    return y.astype(img.dtype)


def _srgb_gamma_inv(u: jax.Array) -> jax.Array:
    """sRGB electro-optical transfer (decode), as in OpenCV's Lab path."""
    return jnp.where(u <= 0.04045, u / 12.92, ((u + 0.055) / 1.055) ** 2.4)


def _srgb_gamma_fwd(u: jax.Array) -> jax.Array:
    u = jnp.maximum(u, 0.0)
    return jnp.where(u <= 0.0031308, u * 12.92, 1.055 * u ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jax.Array) -> jax.Array:
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(ft: jax.Array) -> jax.Array:
    return jnp.where(ft > 0.2068966, ft ** 3, (ft - 16.0 / 116.0) / 7.787)


def rgb_to_lab(img: jax.Array, srgb: bool = True) -> jax.Array:
    """cv2.COLOR_RGB2LAB for uint8 images (L, a, b each in [0, 255]).

    Applies the sRGB gamma decode OpenCV uses for 8-bit Lab, converts through
    D65 XYZ, then scales L by 255/100 and offsets a/b by 128. With srgb=False
    this is OpenCV's COLOR_LRGB2Lab (linear RGB, no gamma) — the variant
    fastNlMeansDenoisingColored uses internally.
    """
    is_int = jnp.issubdtype(img.dtype, jnp.integer)
    x = img.astype(jnp.float32) / (255.0 if is_int else 1.0)
    if srgb:
        x = _srgb_gamma_inv(x)
    xyz = jnp.einsum("...c,dc->...d", x, _RGB2XYZ,
                     precision=jax.lax.Precision.HIGHEST)
    xyz = xyz / _WHITE
    f = _lab_f(xyz)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    if is_int:
        lab = jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)
        return jnp.clip(jnp.round(lab), 0, 255).astype(img.dtype)
    return jnp.stack([L, a, b], axis=-1).astype(img.dtype)


def lab_to_rgb(lab: jax.Array, srgb: bool = True) -> jax.Array:
    """cv2.COLOR_LAB2RGB for uint8 images (srgb=False -> COLOR_Lab2LRGB)."""
    is_int = jnp.issubdtype(lab.dtype, jnp.integer)
    x = lab.astype(jnp.float32)
    if is_int:
        L = x[..., 0] * 100.0 / 255.0
        a = x[..., 1] - 128.0
        b = x[..., 2] - 128.0
    else:
        L, a, b = x[..., 0], x[..., 1], x[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1)
    xyz = xyz * _WHITE
    rgb = jnp.einsum("...c,dc->...d", xyz, _XYZ2RGB,
                     precision=jax.lax.Precision.HIGHEST)
    if srgb:
        rgb = _srgb_gamma_fwd(jnp.clip(rgb, 0.0, None))
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if is_int:
        return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(lab.dtype)
    return rgb.astype(lab.dtype)
