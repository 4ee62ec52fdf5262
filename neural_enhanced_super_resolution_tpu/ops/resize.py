"""OpenCV-parity image resize as separable matmuls (TPU/MXU-friendly).

The reference uses ``cv2.resize`` pervasively: bicubic fallbacks
(/root/reference/nesr/nesr.py:384-388, :601-605, :839-843), Lanczos stitch fixup
(:438-443) and ensemble alignment (:1044), nearest for seg maps (:720-724), and
all four modes in degradation utils (/root/reference/nesr/utils/image_utils.py:119-128).

TPU-first design: instead of gather-based per-pixel sampling (bad for XLA tiling),
a separable resize is expressed as two dense matrix multiplies:

    out[oy, ox, c] = sum_y Wh[oy, y] * sum_x Ww[ox, x] * img[y, x, c]

The interpolation-weight matrices are built host-side in NumPy at trace time
(shapes are static under jit) and cached. The two contractions ride the MXU and
XLA fuses the dtype conversions around them. Accuracy vs. OpenCV is validated in
tests/test_ops_resize.py (uint8 max diff <= 1 for all modes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["resize", "INTER_NEAREST", "INTER_LINEAR", "INTER_CUBIC", "INTER_AREA",
           "INTER_LANCZOS4"]

# Mode constants follow OpenCV's numbering so configs can pass either ints or names.
INTER_NEAREST = 0
INTER_LINEAR = 1
INTER_CUBIC = 2
INTER_AREA = 3
INTER_LANCZOS4 = 4

_MODE_NAMES = {
    "nearest": INTER_NEAREST,
    "bilinear": INTER_LINEAR,
    "linear": INTER_LINEAR,
    "bicubic": INTER_CUBIC,
    "cubic": INTER_CUBIC,
    "area": INTER_AREA,
    "lanczos": INTER_LANCZOS4,
    "lanczos4": INTER_LANCZOS4,
}


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """OpenCV's bicubic kernel (A = -0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _lanczos4_kernel(x: np.ndarray) -> np.ndarray:
    """Lanczos windowed sinc, 8 taps (a=4), as used by INTER_LANCZOS4."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / 4.0)
    return np.where(np.abs(x) < 4.0, out, 0.0)


def _axis_weights_interp(src: int, dst: int, mode: int) -> np.ndarray:
    """Dense (dst, src) weight matrix for one axis, OpenCV center-aligned coords."""
    scale = src / dst
    W = np.zeros((dst, src), dtype=np.float64)
    if mode == INTER_NEAREST:
        # OpenCV INTER_NEAREST: sx = floor(dx * scale), clamped.
        for d in range(dst):
            s = min(int(np.floor(d * scale)), src - 1)
            W[d, s] = 1.0
        return W

    if mode == INTER_LINEAR:
        taps, offs = 2, 0
        kernel = lambda t: np.maximum(0.0, 1.0 - np.abs(t))
    elif mode == INTER_CUBIC:
        taps, offs = 4, 1
        kernel = _cubic_kernel
    elif mode == INTER_LANCZOS4:
        taps, offs = 8, 3
        kernel = _lanczos4_kernel
    else:
        raise ValueError(f"unsupported interp mode {mode}")

    for d in range(dst):
        fx = (d + 0.5) * scale - 0.5
        sx = int(np.floor(fx))
        frac = fx - sx
        t = np.arange(taps) - offs
        w = kernel(frac - t)
        wsum = w.sum()
        if wsum != 0:
            w = w / wsum
        for k in range(taps):
            s = min(max(sx + k - offs, 0), src - 1)  # clamp at borders like cv2
            W[d, s] += w[k]
    return W


def _axis_weights_area_up(src: int, dst: int) -> np.ndarray:
    """INTER_AREA enlargement weights (OpenCV's resizeArea upscale mapping)."""
    scale = src / dst
    inv_scale = dst / src
    W = np.zeros((dst, src), dtype=np.float64)
    for d in range(dst):
        s = int(np.floor(d * scale))
        fx = (d + 1) - (s + 1) * inv_scale
        fx = 0.0 if fx <= 0 else fx - np.floor(fx)
        s0 = min(s, src - 1)
        s1 = min(s + 1, src - 1)
        W[d, s0] += 1.0 - fx
        W[d, s1] += fx
    return W


def _axis_weights_area(src: int, dst: int) -> np.ndarray:
    """Exact area-averaging weights (INTER_AREA decimation)."""
    scale = src / dst
    W = np.zeros((dst, src), dtype=np.float64)
    for d in range(dst):
        lo = d * scale
        hi = (d + 1) * scale
        s0 = int(np.floor(lo))
        s1 = min(int(np.ceil(hi)), src)
        for s in range(s0, s1):
            overlap = min(hi, s + 1) - max(lo, s)
            if overlap > 0:
                W[d, s] = overlap / scale
    return W


@functools.lru_cache(maxsize=512)
def _weight_matrices(src_h: int, src_w: int, dst_h: int, dst_w: int,
                     mode: int) -> tuple[np.ndarray, np.ndarray]:
    if mode == INTER_AREA:
        # cv2: INTER_AREA is exact area averaging only when BOTH axes shrink;
        # otherwise both axes use a floor-aligned 2-tap mapping
        # (resize.cpp's non-decimation INTER_AREA branch).
        if dst_h <= src_h and dst_w <= src_w:
            wh = _axis_weights_area(src_h, dst_h)
            ww = _axis_weights_area(src_w, dst_w)
        else:
            wh = _axis_weights_area_up(src_h, dst_h)
            ww = _axis_weights_area_up(src_w, dst_w)
    else:
        wh = _axis_weights_interp(src_h, dst_h, mode)
        ww = _axis_weights_interp(src_w, dst_w, mode)
    return wh.astype(np.float32), ww.astype(np.float32)


def _normalize_mode(mode) -> int:
    if isinstance(mode, str):
        return _MODE_NAMES[mode.lower()]
    return int(mode)


@functools.partial(jax.jit, static_argnums=(1, 2), static_argnames=("mode",))
def _resize_hwc(img: jax.Array, dst_h: int, dst_w: int, *, mode: int) -> jax.Array:
    src_h, src_w = img.shape[0], img.shape[1]
    wh, ww = _weight_matrices(src_h, src_w, dst_h, dst_w, mode)
    wh = jnp.asarray(wh)
    ww = jnp.asarray(ww)
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    # (dst_h, src_h) @ (src_h, src_w*c) then (dst_h*c, src_w) @ (src_w, dst_w)
    y = jnp.einsum("oh,hwc->owc", wh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,owc->opc", ww, y, precision=jax.lax.Precision.HIGHEST)
    if squeeze:
        y = y[:, :, 0]
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max).astype(img.dtype)
    else:
        y = y.astype(img.dtype)
    return y


def resize(img, dsize=None, fx: float = 0.0, fy: float = 0.0,
           interpolation="bilinear"):
    """Resize an HW or HWC image, matching ``cv2.resize`` semantics.

    Args:
        img: array-like image, uint8 or float, shape (H, W) or (H, W, C).
        dsize: (width, height) tuple — note OpenCV's (w, h) order.
        fx, fy: scale factors used when dsize is None.
        interpolation: mode name or OpenCV int constant.

    Returns:
        jax.Array of the requested size, same dtype as input.
    """
    mode = _normalize_mode(interpolation)
    img = jnp.asarray(img)
    src_h, src_w = img.shape[0], img.shape[1]
    if dsize is not None:
        dst_w, dst_h = int(dsize[0]), int(dsize[1])
    else:
        dst_w = int(round(src_w * fx))
        dst_h = int(round(src_h * fy))
    if dst_h <= 0 or dst_w <= 0:
        raise ValueError(f"invalid destination size ({dst_w}, {dst_h})")
    if (dst_h, dst_w) == (src_h, src_w) and mode != INTER_AREA:
        return img
    return _resize_hwc(img, dst_h, dst_w, mode=mode)
