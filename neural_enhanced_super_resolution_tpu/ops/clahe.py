"""CLAHE (Contrast Limited Adaptive Histogram Equalization) as one XLA op.

The reference applies ``cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8))`` to
the L channel of LAB during preprocessing (/root/reference/nesr/nesr.py:679-685).

This reimplements OpenCV's exact algorithm (modules/imgproc/src/clahe.cpp):
  1. pad right/bottom with reflect-101 so the size divides the tile grid,
  2. per-tile 256-bin histogram (scatter-add),
  3. clip at max(clipLimit*tileArea/256, 1) and redistribute the excess —
     uniform batch plus OpenCV's strided residual distribution,
  4. per-tile LUT = round(cumsum * 255/tileArea),
  5. bilinear interpolation between the 4 neighboring tile LUTs per pixel.

All pixel coordinate/weight grids are static under jit (built with NumPy), so
the op lowers to scatter + cumsum + 4 gathers — no dynamic shapes. Parity vs.
cv2 is validated in tests/test_ops_clahe.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["clahe"]


@functools.lru_cache(maxsize=64)
def _interp_grids(h: int, w: int, tiles_y: int, tiles_x: int,
                  tile_h: int, tile_w: int):
    """Static per-pixel tile indices and bilinear weights (OpenCV mapping)."""
    def axis(n, tiles, tile):
        f = np.arange(n, dtype=np.float64) / tile - 0.5
        i1 = np.floor(f).astype(np.int64)
        a = (f - i1).astype(np.float32)
        i2 = np.minimum(i1 + 1, tiles - 1)
        i1 = np.maximum(i1, 0)
        return i1, i2, a

    ty1, ty2, ya = axis(h, tiles_y, tile_h)
    tx1, tx2, xa = axis(w, tiles_x, tile_w)
    return (ty1, ty2, ya.astype(np.float32),
            tx1, tx2, xa.astype(np.float32))


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles_y", "tiles_x"))
def _clahe_u8(src: jax.Array, *, clip_limit: float, tiles_y: int,
              tiles_x: int) -> jax.Array:
    h, w = src.shape
    # Extend right/bottom so the size divides the grid (cv2 copyMakeBorder).
    he = -(-h // tiles_y) * tiles_y
    we = -(-w // tiles_x) * tiles_x
    ext = jnp.pad(src, ((0, he - h), (0, we - w)), mode="reflect")
    th, tw = he // tiles_y, we // tiles_x
    tile_area = th * tw
    n_tiles = tiles_y * tiles_x

    # --- per-tile histograms ---
    # Chunked one-hot compare+reduce: ~2x faster than scatter-add on TPU
    # (the VPU streams fused compare/sum; scatter serializes).
    vals = ext.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    vals = vals.reshape(n_tiles, tile_area).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    n_chunks = 16 if tile_area % 16 == 0 else 1
    chunks = vals.reshape(n_tiles, n_chunks,
                          tile_area // n_chunks).transpose(1, 0, 2)

    def _accum(carry, v):
        return carry + jnp.sum(v[:, :, None] == bins, axis=1,
                               dtype=jnp.int32), None

    hist, _ = jax.lax.scan(_accum, jnp.zeros((n_tiles, 256), jnp.int32),
                           chunks)

    # --- clip + redistribute (OpenCV's batch + strided-residual scheme) ---
    if clip_limit > 0:
        limit = max(int(clip_limit * tile_area / 256.0), 1)
        clipped = jnp.sum(jnp.maximum(hist - limit, 0), axis=1, keepdims=True)
        hist = jnp.minimum(hist, limit)
        batch = clipped // 256
        residual = clipped - batch * 256
        hist = hist + batch
        # residualStep = max(256 // residual, 1); bins 0, step, 2*step, ...
        # receive one extra count until `residual` increments were made.
        step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
        bins = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, 256), 1)
        gets_one = ((bins % step) == 0) & ((bins // step) < residual) & (residual > 0)
        hist = hist + gets_one.astype(jnp.int32)

    # --- LUTs ---
    scale = 255.0 / float(tile_area)
    lut = jnp.clip(jnp.round(jnp.cumsum(hist, axis=1) * scale), 0, 255)
    lut = lut.reshape(tiles_y, tiles_x, 256).astype(jnp.float32)

    # --- bilinear interpolation between the 4 neighboring tile LUTs ---
    ty1, ty2, ya, tx1, tx2, xa = _interp_grids(h, w, tiles_y, tiles_x, th, tw)
    ty1, ty2 = jnp.asarray(ty1), jnp.asarray(ty2)
    tx1, tx2 = jnp.asarray(tx1), jnp.asarray(tx2)
    ya = jnp.asarray(ya)[:, None]
    xa = jnp.asarray(xa)[None, :]
    v = src.astype(jnp.int32)

    flat_lut = lut.reshape(-1)

    def sample(tyi, txi):
        idx = (tyi[:, None] * tiles_x + txi[None, :]) * 256 + v
        return flat_lut[idx]

    top = sample(ty1, tx1) * (1.0 - xa) + sample(ty1, tx2) * xa
    bot = sample(ty2, tx1) * (1.0 - xa) + sample(ty2, tx2) * xa
    out = top * (1.0 - ya[:, :]) + bot * ya[:, :]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def clahe(src, clip_limit: float = 2.0, tile_grid_size=(8, 8)) -> jax.Array:
    """cv2.createCLAHE(clipLimit, tileGridSize).apply(src) for uint8 images."""
    src = jnp.asarray(src)
    if src.dtype != jnp.uint8:
        raise TypeError("clahe expects a uint8 single-channel image")
    if src.ndim != 2:
        raise ValueError("clahe expects a 2-D (H, W) image")
    return _clahe_u8(src, clip_limit=float(clip_limit),
                     tiles_y=int(tile_grid_size[1]), tiles_x=int(tile_grid_size[0]))
