"""Parallelism layer: tiling engine, device mesh, shard_map execution."""

from neural_enhanced_super_resolution_tpu.parallel.tiling import (
    pad_to_grid, extract_tiles, stitch_tiles, process_tiled,
    process_with_tiling_parity)
from neural_enhanced_super_resolution_tpu.parallel.mesh import (
    make_mesh, tile_sharding, replicated)
from neural_enhanced_super_resolution_tpu.parallel.sharded import (
    process_tiled_sharded, halo_exchange_strips, process_strips_sharded)
from neural_enhanced_super_resolution_tpu.parallel.ensemble import (
    ensemble_members_sharded)

__all__ = [
    "pad_to_grid", "extract_tiles", "stitch_tiles", "process_tiled",
    "process_with_tiling_parity",
    "make_mesh", "tile_sharding", "replicated",
    "process_tiled_sharded", "halo_exchange_strips", "process_strips_sharded",
    "ensemble_members_sharded",
]
