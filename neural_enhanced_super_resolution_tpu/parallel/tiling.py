"""Overlap-halo tiling engine — the TPU-native answer to the reference's
``_process_with_tiling`` (/root/reference/nesr/nesr.py:311-475).

Two modes:

* **batched mode (default, TPU-fast)** — the image is padded (reflect) to a
  uniform tile grid, every tile is extracted *with its halo* into one
  (num_tiles, T+2h, T+2h, C) batch, the jitted model runs once over the whole
  batch (static shapes -> one compile, tiles ride the batch dimension of the
  MXU convs), and stitching is a crop + reshape entirely on device. No
  per-tile Python loop, no resize fix-ups.

* **parity mode** — mirrors the reference's exact stitch arithmetic
  (int-truncated halo crops, Lanczos fix-up on size mismatch, per-tile bicubic
  fallback, the <=256 px probe) for output comparisons against the reference.

The graceful-degradation ladder (probe failure -> bicubic everywhere; per-tile
failure -> bicubic tile) is host-side dispatch, never traced control flow
(SURVEY.md §7 "Keeping the ladder").
"""

from __future__ import annotations

import logging
import math
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.ops.resize import resize as _resize

logger = logging.getLogger("nesr.tiling")

__all__ = ["pad_to_grid", "extract_tiles", "stitch_tiles", "process_tiled",
           "process_tiled_to_host", "process_with_tiling_parity",
           "TilingCancelled"]


def pad_to_grid(image: jax.Array, tile: int) -> tuple[jax.Array, int, int]:
    """Reflect-pad (H, W, C) on the bottom/right to a multiple of ``tile``."""
    h, w = image.shape[0], image.shape[1]
    ph = (-h) % tile
    pw = (-w) % tile
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    return image, h, w


def extract_tiles(image: jax.Array, tile: int, halo: int) -> jax.Array:
    """(H, W, C) -> (ny*nx, tile+2*halo, tile+2*halo, C) with reflect halos.

    H and W must be multiples of ``tile`` (use pad_to_grid first). The halo
    ring comes from neighbouring pixels (reflected at the image border), so
    every tile sees identical-statistics context — unlike the reference,
    whose edge tiles simply lose context.
    """
    h, w, c = image.shape
    ny, nx = h // tile, w // tile
    padded = jnp.pad(image, ((halo, halo), (halo, halo), (0, 0)),
                     mode="reflect")
    # Gather all tiles as strided windows: window k = tile + 2*halo.
    k = tile + 2 * halo
    # (ny, k, w+2halo, c) rows first
    row_idx = (jnp.arange(ny) * tile)[:, None] + jnp.arange(k)[None, :]
    rows = padded[row_idx]  # (ny, k, W+2h, C)
    col_idx = (jnp.arange(nx) * tile)[:, None] + jnp.arange(k)[None, :]
    tiles = rows[:, :, col_idx]  # (ny, k, nx, k, C)
    tiles = tiles.transpose(0, 2, 1, 3, 4)  # (ny, nx, k, k, C)
    return tiles.reshape(ny * nx, k, k, c)


def stitch_tiles(tiles: jax.Array, ny: int, nx: int, tile_out: int,
                 halo_out: int) -> jax.Array:
    """(ny*nx, tile_out+2*halo_out, ..., C) -> (ny*tile_out, nx*tile_out, C).

    Crops the upscaled halo from every tile and reassembles — a pure
    slice + transpose + reshape, fused by XLA into a single copy.
    """
    n, k, _, c = tiles.shape
    core = tiles[:, halo_out:halo_out + tile_out, halo_out:halo_out + tile_out, :]
    core = core.reshape(ny, nx, tile_out, tile_out, c)
    core = core.transpose(0, 2, 1, 3, 4)  # (ny, tile_out, nx, tile_out, c)
    return core.reshape(ny * tile_out, nx * tile_out, c)


def _bucket(k: int, cap: int) -> int:
    """Smallest power-of-two >= k, capped — so a 6-tile image runs an
    8-tile program instead of padding to the full 16-tile batch (62%
    wasted trunk compute for small serving inputs). Buckets keep the
    jit-specialization count logarithmic and every bucket caches."""
    b = 1
    while b < k:
        b *= 2
    return min(b, cap)


class TilingCancelled(Exception):
    """Raised between tile-batch chunks when the caller's cancel_check fires.

    Cooperative mid-stage cancellation (the reference's GUI stop is
    cooperative-only and takes effect at thread end, nesr/gui/app.py:136-138;
    here a long tile sweep aborts at the next chunk boundary)."""


def process_tiled(model_fn: Callable[[jax.Array], jax.Array], image,
                  tile_size: int = 512, halo: int = 16, scale: int = 2,
                  batch_tiles: int | None = None,
                  cancel_check: Callable[[], bool] | None = None,
                  tail: str = "bucket") -> jax.Array:
    """Batched-uniform tiled processing (the TPU-fast path).

    Args:
        model_fn: jittable (N, T+2h, T+2h, C) -> (N, s*(T+2h), s*(T+2h), C')
            batch processor (e.g. the RRDB forward).
        image: (H, W, C) array (any dtype; passed through to model_fn's caller
            contract — the pipeline feeds uint8 and converts inside model_fn).
        tile_size: square tile edge before the halo.
        halo: overlap halo in input pixels.
        scale: model's spatial scale factor (output crop uses scale*halo).
        batch_tiles: process at most this many tiles per model_fn call
            (bounds peak HBM); None = all tiles in one batch.
        cancel_check: optional callable polled before each chunk; a True
            return raises TilingCancelled (cooperative mid-stage stop).
        tail: "bucket" pads partial chunks to a power-of-two bucket
            (logarithmic jit specializations — cheapest compute for small
            serving inputs); "full" pads every chunk to batch_tiles so ONE
            executable covers every image size. On remote-compile/tunnel
            TPU hosts each additional big executable costs seconds of
            first-execution load per process, which dwarfs the padded
            tiles' compute (benchmarks/RESULTS.md round-4 warm-serving
            study), so the TPU pipeline default is "full"
            (runtime/config.py tile_tail).

    Returns:
        (H*scale, W*scale, C') on-device array.
    """
    if isinstance(image, np.ndarray) and image.dtype == np.uint8:
        # Host-resident input: stage the packed tile batch with the native
        # C++ extractor (runtime/native.py) and ship ONE contiguous H2D
        # transfer instead of device-side gathers.
        from neural_enhanced_super_resolution_tpu.runtime import native
        orig_h, orig_w = image.shape[0], image.shape[1]
        ph_pad = (-orig_h) % tile_size
        pw_pad = (-orig_w) % tile_size
        if ph_pad or pw_pad:
            image = np.pad(image, ((0, ph_pad), (0, pw_pad), (0, 0)),
                           mode="reflect")
        ny = image.shape[0] // tile_size
        nx = image.shape[1] // tile_size
        tiles = jnp.asarray(native.extract_tiles_u8(image, tile_size, halo))
    else:
        image = jnp.asarray(image)
        padded, orig_h, orig_w = pad_to_grid(image, tile_size)
        ph, pw = int(padded.shape[0]), int(padded.shape[1])
        ny, nx = ph // tile_size, pw // tile_size
        tiles = extract_tiles(padded, tile_size, halo)
    n = tiles.shape[0]

    if batch_tiles is None:
        out_tiles = model_fn(tiles)
    else:
        chunks = []
        # Full chunks run at batch_tiles (one hot specialization); the tail
        # (or a small image's only chunk) pads per the tail policy.
        for start in range(0, n, batch_tiles):
            if cancel_check is not None and cancel_check():
                raise TilingCancelled(
                    f"cancelled at tile {start}/{n}")
            chunk = tiles[start:start + batch_tiles]
            valid = chunk.shape[0]
            bucket = (batch_tiles if tail == "full"
                      else _bucket(valid, batch_tiles))
            if valid < bucket:
                pad_n = bucket - valid
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad_n, axis=0)], axis=0)
            chunks.append(model_fn(chunk)[:valid])
        out_tiles = (chunks[0] if len(chunks) == 1
                     else jnp.concatenate(chunks, axis=0))

    out = stitch_tiles(out_tiles, ny, nx, tile_size * scale, halo * scale)
    return out[:orig_h * scale, :orig_w * scale, :]


def process_tiled_to_host(model_fn: Callable[[jax.Array], jax.Array], image,
                          tile_size: int = 512, halo: int = 16,
                          scale: int = 2, batch_tiles: int = 16,
                          cancel_check: Callable[[], bool] | None = None,
                          tail: str = "full",
                          fetch_threads: int = 4) -> np.ndarray:
    """Tiled processing that lands directly in HOST memory, overlapping each
    chunk's device->host fetch with the next chunks' compute.

    The plain path computes the whole output on device and fetches it at the
    end — on tunnel-attached TPUs that final fetch runs ~23 MB/s and is the
    single largest cost of a big enhancement (benchmarks/RESULTS.md round-4
    D2H study). Here chunk i's halo-cropped output tiles stream to the host
    canvas on fetch threads while chunks i+1.. execute, so fetch time hides
    under compute (and vice versa). Output is bit-identical to
    ``np.asarray(process_tiled(...))`` with the same tail policy.
    """
    import concurrent.futures

    if isinstance(image, np.ndarray) and image.dtype == np.uint8:
        from neural_enhanced_super_resolution_tpu.runtime import native
        orig_h, orig_w = image.shape[0], image.shape[1]
        ph_pad = (-orig_h) % tile_size
        pw_pad = (-orig_w) % tile_size
        if ph_pad or pw_pad:
            image = np.pad(image, ((0, ph_pad), (0, pw_pad), (0, 0)),
                           mode="reflect")
        ny = image.shape[0] // tile_size
        nx = image.shape[1] // tile_size
        tiles = jnp.asarray(native.extract_tiles_u8(image, tile_size, halo))
    else:
        image = jnp.asarray(image)
        padded, orig_h, orig_w = pad_to_grid(image, tile_size)
        ny = int(padded.shape[0]) // tile_size
        nx = int(padded.shape[1]) // tile_size
        tiles = extract_tiles(padded, tile_size, halo)
    n = tiles.shape[0]
    to = tile_size * scale
    ho = halo * scale
    canvas = None

    def land(core_dev, start, valid):
        cores = np.asarray(core_dev)  # blocks in this thread until computed
        for j in range(valid):
            iy, ix = divmod(start + j, nx)
            canvas[iy * to:(iy + 1) * to, ix * to:(ix + 1) * to] = cores[j]

    futures = []
    with concurrent.futures.ThreadPoolExecutor(fetch_threads) as pool:
        for start in range(0, n, batch_tiles):
            if cancel_check is not None and cancel_check():
                for f in futures:
                    f.cancel()
                raise TilingCancelled(f"cancelled at tile {start}/{n}")
            chunk = tiles[start:start + batch_tiles]
            valid = chunk.shape[0]
            bucket = (batch_tiles if tail == "full"
                      else _bucket(valid, batch_tiles))
            if valid < bucket:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], bucket - valid, axis=0)],
                    axis=0)
            out = model_fn(chunk)
            core = out[:valid, ho:ho + to, ho:ho + to, :]  # crop on device
            if canvas is None:
                # shape/dtype come from the aval — no device sync, so chunk 0
                # streams on the pool like every other chunk and the device
                # moves straight on to chunk 1.
                canvas = np.empty((ny * to, nx * to, core.shape[-1]),
                                  dtype=core.dtype)
            futures.append(pool.submit(land, core, start, valid))
        for f in futures:
            f.result()  # propagate fetch/compute errors
    return canvas[:orig_h * scale, :orig_w * scale, :]


# --------------------------------------------------------------------------
# Parity mode: the reference's exact per-tile arithmetic.
# --------------------------------------------------------------------------

def process_with_tiling_parity(processor_func: Callable, image: np.ndarray,
                               upscale_factor: float, tile_size: int = 512,
                               padding: int = 10) -> np.ndarray:
    """Reference-parity tiled processing (host loop, numpy in/out).

    Reproduces _process_with_tiling (/root/reference/nesr/nesr.py:311-475)
    behaviour exactly: the <=256 px probe, int-truncated halo crop windows,
    Lanczos resize on size mismatch, per-tile bicubic fallback, and the
    preallocated uint8 canvas sized by the *configured* (not actual) scale.
    """
    image = np.asarray(image)
    h, w, c = image.shape
    if h <= tile_size and w <= tile_size:
        return np.asarray(processor_func(image))

    num_tiles_h = math.ceil(h / tile_size)
    num_tiles_w = math.ceil(w / tile_size)
    out_h = int(h * upscale_factor)
    out_w = int(w * upscale_factor)
    output = np.zeros((out_h, out_w, c), dtype=np.uint8)

    logger.info("Processing image in %dx%d tiles", num_tiles_h, num_tiles_w)

    # Probe on a corner tile; on failure, bicubic for all tiles.
    try:
        test_size = min(256, tile_size)
        processor_func(image[:test_size, :test_size])
        processor_works = True
        logger.info("Tile processor test successful")
    except Exception as exc:  # noqa: BLE001 - ladder rung, not traced
        logger.warning("Tile processor test failed: %s", exc)
        processor_works = False
        logger.warning("Falling back to bicubic scaling for all tiles")

    def _bicubic(tile_img, dw, dh):
        return np.asarray(_resize(tile_img, dsize=(dw, dh),
                                  interpolation="bicubic"))

    for i in range(num_tiles_h):
        for j in range(num_tiles_w):
            y_start = max(0, i * tile_size - padding)
            y_end = min(h, (i + 1) * tile_size + padding)
            x_start = max(0, j * tile_size - padding)
            x_end = min(w, (j + 1) * tile_size + padding)
            tile = image[y_start:y_end, x_start:x_end]

            try:
                if processor_works:
                    processed = np.asarray(processor_func(tile))
                else:
                    processed = _bicubic(
                        tile, int(tile.shape[1] * upscale_factor),
                        int(tile.shape[0] * upscale_factor))

                out_y_start = int(y_start * upscale_factor)
                out_y_end = int(y_end * upscale_factor)
                out_x_start = int(x_start * upscale_factor)
                out_x_end = int(x_end * upscale_factor)
                if padding > 0:
                    pad_up = int(padding * upscale_factor)
                    if y_start > 0:
                        out_y_start += pad_up
                    if y_end < h:
                        out_y_end -= pad_up
                    if x_start > 0:
                        out_x_start += pad_up
                    if x_end < w:
                        out_x_end -= pad_up

                t_h, t_w = processed.shape[:2]
                scale_y = t_h / tile.shape[0]
                scale_x = t_w / tile.shape[1]
                ty0 = 0 if y_start == 0 else int(padding * scale_y)
                ty1 = t_h if y_end == h else int(t_h - padding * scale_y)
                tx0 = 0 if x_start == 0 else int(padding * scale_x)
                tx1 = t_w if x_end == w else int(t_w - padding * scale_x)
                ty0 = max(0, min(ty0, t_h - 1))
                ty1 = max(ty0 + 1, min(ty1, t_h))
                tx0 = max(0, min(tx0, t_w - 1))
                tx1 = max(tx0 + 1, min(tx1, t_w))

                oh = out_y_end - out_y_start
                ow = out_x_end - out_x_start
                if oh <= 0 or ow <= 0:
                    logger.warning("Invalid output region for tile (%d,%d)",
                                   i, j)
                    continue
                region = processed[ty0:ty1, tx0:tx1]
                if region.shape[0] != oh or region.shape[1] != ow:
                    region = np.asarray(_resize(region, dsize=(ow, oh),
                                                interpolation="lanczos4"))
                output[out_y_start:out_y_end, out_x_start:out_x_end] = region

            except Exception as exc:  # noqa: BLE001 - per-tile ladder rung
                logger.warning("Error processing tile (%d,%d): %s", i, j, exc)
                bt = _bicubic(tile, int(tile.shape[1] * upscale_factor),
                              int(tile.shape[0] * upscale_factor))
                oy0 = int(i * tile_size * upscale_factor)
                oy1 = min(int(h * upscale_factor),
                          int((i + 1) * tile_size * upscale_factor))
                ox0 = int(j * tile_size * upscale_factor)
                ox1 = min(int(w * upscale_factor),
                          int((j + 1) * tile_size * upscale_factor))
                if oy1 > oy0 and ox1 > ox0:
                    if bt.shape[0] != oy1 - oy0 or bt.shape[1] != ox1 - ox0:
                        bt = _bicubic(bt, ox1 - ox0, oy1 - oy0)
                    output[oy0:oy1, ox0:ox1] = bt

    return output
