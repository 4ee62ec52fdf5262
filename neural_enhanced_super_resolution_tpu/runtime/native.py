"""ctypes bindings for the native host staging runtime (csrc/nesr_host.cpp).

Builds on demand (``make -C csrc``) and falls back to numpy implementations
when no compiler/.so is available — the framework stays functional either
way; the native path is a host-throughput optimization for large images
(SURVEY.md §2b: the reference's equivalent layer is OpenCV's C++ core).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("nesr.native")

__all__ = ["native_available", "extract_tiles_u8", "stitch_tiles_u8",
           "stack12_u8"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libnesr_host.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(
            os.path.join(_CSRC, "Makefile")):
        try:  # best-effort build
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception as exc:
            logger.debug("native build failed: %s", exc)
    if os.path.exists(_SO):
        try:
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.nesr_extract_tiles_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, u8p]
            lib.nesr_stitch_tiles_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, u8p]
            lib.nesr_stack12_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                            f32p]
            _lib = lib
            logger.debug("native host runtime loaded from %s", _SO)
        except OSError as exc:
            logger.debug("native load failed: %s", exc)
    return _lib


def native_available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def extract_tiles_u8(image: np.ndarray, tile: int, halo: int) -> np.ndarray:
    """(H, W, C) uint8 -> (ny*nx, k, k, C) with reflect-101 halos.

    H, W must be multiples of tile (pad first). Uses the native library when
    available, else a numpy fallback with identical semantics.
    """
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    assert h % tile == 0 and w % tile == 0, "pad to the tile grid first"
    ny, nx = h // tile, w // tile
    k = tile + 2 * halo
    lib = _load()
    if lib is not None:
        out = np.empty((ny * nx, k, k, c), np.uint8)
        lib.nesr_extract_tiles_u8(_u8(image), h, w, c, tile, halo, _u8(out))
        return out
    padded = np.pad(image, ((halo, halo), (halo, halo), (0, 0)),
                    mode="reflect")
    out = np.empty((ny * nx, k, k, c), np.uint8)
    for t in range(ny * nx):
        ty, tx = divmod(t, nx)
        out[t] = padded[ty * tile:ty * tile + k, tx * tile:tx * tile + k]
    return out


def stitch_tiles_u8(tiles: np.ndarray, ny: int, nx: int, tile_out: int,
                    halo_out: int) -> np.ndarray:
    """(ny*nx, ko, ko, C) uint8 -> (ny*tile_out, nx*tile_out, C)."""
    tiles = np.ascontiguousarray(tiles, dtype=np.uint8)
    c = tiles.shape[-1]
    lib = _load()
    if lib is not None:
        out = np.empty((ny * tile_out, nx * tile_out, c), np.uint8)
        lib.nesr_stitch_tiles_u8(_u8(tiles), ny, nx, tile_out, halo_out, c,
                                 _u8(out))
        return out
    core = tiles[:, halo_out:halo_out + tile_out,
                 halo_out:halo_out + tile_out, :]
    core = core.reshape(ny, nx, tile_out, tile_out, c)
    return core.transpose(0, 2, 1, 3, 4).reshape(ny * tile_out,
                                                 nx * tile_out, c)


def stack12_u8(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W, 12) float32 BGR variant stack
    (reference 12-channel builder, nesr.py:860-879)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    lib = _load()
    if lib is not None:
        out = np.empty((h, w, 12), np.float32)
        lib.nesr_stack12_u8(_u8(rgb),  h, w,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_float)))
        return out
    # numpy fallback
    bgr = rgb[..., ::-1].astype(np.float32) / 255.0
    k = np.array([1.0, 2.0, 1.0]) / 4.0
    tmp = np.pad(rgb[..., ::-1].astype(np.uint16), ((0, 0), (1, 1), (0, 0)),
                 mode="reflect")
    hsum = tmp[:, :-2] + 2 * tmp[:, 1:-1] + tmp[:, 2:]
    vpad = np.pad(hsum, ((1, 1), (0, 0), (0, 0)), mode="reflect")
    acc = vpad[:-2] + 2 * vpad[1:-1] + vpad[2:]
    blurred = ((acc + 8) // 16).astype(np.float32) / 255.0
    del k
    return np.concatenate([bgr, np.minimum(bgr * 1.1, 1.0), bgr * 0.9,
                           blurred], axis=-1).astype(np.float32)
