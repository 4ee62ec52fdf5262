"""Multi-chip execution: tile-batch data parallelism and strip sharding with
ICI halo exchange.

TPU-native replacements for what the reference doesn't have (single device,
sequential tile loop — /root/reference/nesr/nesr.py:367-368):

* ``process_tiled_sharded`` — the tile batch is sharded over a 1-D mesh axis;
  each chip runs the jitted model on its tiles. Tiles are independent, so the
  only collective is the implicit all-gather when stitching.

* ``halo_exchange_strips`` / ``process_strips_sharded`` — the image is sharded
  into horizontal strips (one per chip); each step of a conv model needs
  ``halo`` rows of context, exchanged with mesh neighbours via
  ``jax.lax.ppermute`` over ICI (ring-attention-shaped neighbour comms applied
  to conv halos, SURVEY.md §5 "Long-context"). The model then runs entirely
  locally on strip+halo and the output stays sharded.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from neural_enhanced_super_resolution_tpu.parallel.tiling import (
    extract_tiles, pad_to_grid, stitch_tiles)

__all__ = ["process_tiled_sharded", "halo_exchange_strips",
           "process_strips_sharded"]


def process_tiled_sharded(model_fn: Callable, image, mesh: Mesh,
                          tile_size: int = 512, halo: int = 16,
                          scale: int = 2, axis_name: str = "dp",
                          batch_tiles: int | None = None,
                          cancel_check: Callable[[], bool] | None = None,
                          tail: str = "bucket") -> jax.Array:
    """Tile-batch DP over a device mesh.

    The tile batch is padded up to a multiple of the mesh size (repeating the
    last tile) so every chip gets an equal static-shape shard, then sharded
    with jax.device_put — XLA partitions the batched conv automatically; no
    per-tile Python loop and no host round-trips.

    batch_tiles bounds the PER-DEVICE tiles per model invocation (the same
    HBM guard as the single-device path — a 16K image would otherwise ship
    hundreds of tiles per chip in one program); cancel_check is polled
    between chunks (parallel/tiling.TilingCancelled).
    """
    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        TilingCancelled)

    image = jnp.asarray(image)
    n_dev = mesh.devices.size
    padded, orig_h, orig_w = pad_to_grid(image, tile_size)
    ph, pw = int(padded.shape[0]), int(padded.shape[1])
    ny, nx = ph // tile_size, pw // tile_size

    tiles = extract_tiles(padded, tile_size, halo)
    n = tiles.shape[0]
    step = n if batch_tiles is None else max(n_dev, batch_tiles * n_dev)
    sharding = NamedSharding(mesh, P(axis_name))

    chunks = []
    for start in range(0, n, step):
        if cancel_check is not None and cancel_check():
            raise TilingCancelled(f"cancelled at tile {start}/{n}")
        chunk = tiles[start:start + step]
        valid = chunk.shape[0]
        # tail pads to a power-of-two per-device bucket (same policy as
        # process_tiled) so specializations stay logarithmic across sizes
        per_dev = -(-valid // n_dev)
        bucket = 1
        while bucket < per_dev:
            bucket *= 2
        # target must stay a multiple of n_dev (shard divisibility); with a
        # batch_tiles cap it also stays <= step (itself n_dev-aligned).
        # tail="full" pads to the full per-chunk size so one executable
        # covers every image size (same policy as tiling.process_tiled).
        if tail == "full" and batch_tiles is not None:
            target = step
        else:
            target = (bucket * n_dev if batch_tiles is None
                      else min(step, bucket * n_dev))
        if valid < target:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], target - valid, axis=0)],
                axis=0)
        chunk = jax.device_put(chunk, sharding)
        chunks.append(model_fn(chunk)[:valid])
    out_tiles = (chunks[0] if len(chunks) == 1
                 else jnp.concatenate(chunks, axis=0))
    out = stitch_tiles(out_tiles, ny, nx, tile_size * scale, halo * scale)
    return out[:orig_h * scale, :orig_w * scale, :]


def halo_exchange_strips(strip: jax.Array, halo: int, axis_name: str):
    """Inside shard_map: fetch ``halo`` rows from both ring neighbours.

    strip: (rows_per_chip, W, C) local shard. Returns (rows+2*halo, W, C); the
    first/last chip's missing side is filled by reflecting its own edge.
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    # Send my top rows to the previous chip (they become its bottom halo) and
    # my bottom rows to the next chip (its top halo). Two ICI ppermutes.
    top_rows = strip[:halo]
    bot_rows = strip[-halo:]
    from_next = lax.ppermute(top_rows, axis_name,
                             [(i, (i - 1) % n) for i in range(n)])
    from_prev = lax.ppermute(bot_rows, axis_name,
                             [(i, (i + 1) % n) for i in range(n)])

    # Boundary chips reflect their own edge instead of wrapping around.
    reflect_top = strip[1:halo + 1][::-1]
    reflect_bot = strip[-halo - 1:-1][::-1]
    top_halo = jnp.where(idx == 0, reflect_top, from_prev)
    bot_halo = jnp.where(idx == n - 1, reflect_bot, from_next)
    return jnp.concatenate([top_halo, strip, bot_halo], axis=0)


def process_strips_sharded(model_fn: Callable, image, mesh: Mesh,
                           halo: int = 16, scale: int = 2,
                           axis_name: str = "dp") -> jax.Array:
    """Strip-shard an (H, W, C) image across the mesh with ICI halo exchange.

    Each chip holds H/n rows; halos move over ICI via ppermute; ``model_fn``
    (jittable, (1, rows+2h, W, C) -> (1, scale*(rows+2h), scale*W, C')) runs
    on the local strip; the halo is cropped after upscaling. H must divide the
    mesh size times 1 (pad first if needed).
    """
    image = jnp.asarray(image)
    n_dev = mesh.devices.size
    h, w = int(image.shape[0]), int(image.shape[1])
    ph = (-h) % n_dev
    if ph:
        image = jnp.pad(image, ((0, ph), (0, 0), (0, 0)), mode="reflect")

    def local(strip):
        strip = halo_exchange_strips(strip, halo, axis_name)
        out = model_fn(strip[None])[0]
        return out[halo * scale:-halo * scale]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(axis_name, None, None),
    )
    out = sharded(image)
    return out[:h * scale]
