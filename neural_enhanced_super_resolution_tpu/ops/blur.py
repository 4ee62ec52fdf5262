"""Separable filtering ops matching OpenCV kernels and border semantics.

Used by the reference for: unsharp masking (GaussianBlur sigma=3,
/root/reference/nesr/nesr.py:739, :1068), the detail mask (sigma=2, :1063), the
12-channel blurred variant (ksize=3, sigma=0, :872), degradation blur
(/root/reference/nesr/utils/image_utils.py:80-94: gaussian/box/motion), and
mask dilation (nesr.py:735-736).

TPU-first: depthwise `lax.conv_general_dilated` on NHWC with explicit
reflect-101 padding — XLA maps small depthwise convs onto the VPU and fuses the
surrounding arithmetic. Kernels are built host-side with OpenCV's exact rules
(small-kernel tables, ksize-from-sigma formula).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gaussian_kernel1d", "gaussian_blur", "box_blur", "filter2d",
           "dilate"]

# OpenCV's fixed small-gaussian tables for ksize<=7 with sigma<=0
# (modules/imgproc/src/smooth.dispatch.cpp, getGaussianKernel).
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
                 0.03125]),
}


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics (incl. fixed small-kernel tables)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].astype(np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _ksize_from_sigma(sigma: float, uint8: bool = True) -> int:
    """OpenCV: ksize = round(sigma * (8U ? 3 : 4) * 2 + 1) | 1."""
    factor = 3 if uint8 else 4
    k = int(round(sigma * factor * 2 + 1))
    return k | 1


def _to_nhwc(img: jax.Array) -> tuple[jax.Array, bool, bool]:
    """Lift (H,W) or (H,W,C) to (1,H,W,C) float32."""
    squeeze_c = img.ndim == 2
    if squeeze_c:
        img = img[:, :, None]
    squeeze_n = img.ndim == 3
    if squeeze_n:
        img = img[None]
    return img.astype(jnp.float32), squeeze_n, squeeze_c


def _from_nhwc(y: jax.Array, dtype, squeeze_n: bool, squeeze_c: bool) -> jax.Array:
    if squeeze_n:
        y = y[0]
    if squeeze_c:
        y = y[..., 0]
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        return jnp.clip(jnp.round(y), info.min, info.max).astype(dtype)
    return y.astype(dtype)


def _reflect101_pad(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """cv2 BORDER_DEFAULT (= BORDER_REFLECT_101) == jnp 'reflect'."""
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")


def _depthwise_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise NHWC conv, kernel (kh, kw), valid padding."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    filt = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x, filt, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("kh", "kw"))
def _sep_blur(img, kern_h, kern_w, kh: int, kw: int):
    x, sn, sc = _to_nhwc(img)
    x = _reflect101_pad(x, kh // 2, kw // 2)
    # Separable: vertical then horizontal 1-D depthwise convs.
    x = _depthwise_conv(x, kern_h[:, None])
    x = _depthwise_conv(x, kern_w[None, :])
    return _from_nhwc(x, img.dtype, sn, sc)


def gaussian_blur(img, ksize=(0, 0), sigma: float = 0.0,
                  sigma_y: float | None = None) -> jax.Array:
    """cv2.GaussianBlur(img, ksize, sigmaX[, sigmaY]) with BORDER_REFLECT_101."""
    img = jnp.asarray(img)
    kw_, kh_ = (int(ksize[0]), int(ksize[1])) if ksize else (0, 0)
    sy = sigma if sigma_y is None else sigma_y
    uint8 = jnp.issubdtype(img.dtype, jnp.integer)
    if kw_ <= 0:
        kw_ = _ksize_from_sigma(sigma, uint8)
    if kh_ <= 0:
        kh_ = _ksize_from_sigma(sy, uint8)
    kern_w = jnp.asarray(gaussian_kernel1d(kw_, sigma))
    kern_h = jnp.asarray(gaussian_kernel1d(kh_, sy))
    return _sep_blur(img, kern_h, kern_w, kh_, kw_)


def box_blur(img, ksize: tuple[int, int]) -> jax.Array:
    """cv2.boxFilter(img, -1, ksize) — normalized box, reflect-101 border."""
    img = jnp.asarray(img)
    kw_, kh_ = int(ksize[0]), int(ksize[1])
    kern_w = jnp.full((kw_,), 1.0 / kw_, dtype=jnp.float32)
    kern_h = jnp.full((kh_,), 1.0 / kh_, dtype=jnp.float32)
    return _sep_blur(img, kern_h, kern_w, kh_, kw_)


@functools.partial(jax.jit, static_argnames=("kh", "kw"))
def _filter2d(img, kernel, kh: int, kw: int):
    x, sn, sc = _to_nhwc(img)
    x = _reflect101_pad(x, kh // 2, kw // 2)
    # cv2.filter2D computes correlation (no kernel flip) — flip for conv primitive.
    x = _depthwise_conv(x, kernel[::-1, ::-1])
    return _from_nhwc(x, img.dtype, sn, sc)


def filter2d(img, kernel) -> jax.Array:
    """cv2.filter2D(img, -1, kernel): correlation with reflect-101 border."""
    img = jnp.asarray(img)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    return _filter2d(img, kernel, kernel.shape[0], kernel.shape[1])


@functools.partial(jax.jit, static_argnames=("ksize", "iterations"))
def _dilate(img, ksize: int, iterations: int):
    x, sn, sc = _to_nhwc(img)
    pad = ksize // 2
    for _ in range(iterations):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="constant", constant_values=-jnp.inf)
        x = lax.reduce_window(
            xp, -jnp.inf, lax.max,
            window_dimensions=(1, ksize, ksize, 1),
            window_strides=(1, 1, 1, 1), padding="VALID")
    return _from_nhwc(x, img.dtype, sn, sc)


def dilate(img, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """cv2.dilate with a ksize x ksize all-ones structuring element."""
    return _dilate(jnp.asarray(img), ksize, iterations)
