"""Device-mesh helpers (layer L1' of the TPU-native build).

The reference has no distributed layer at all (SURVEY.md §2c) — its concurrency
is two Qt worker threads. Here the scaling axis for super-resolution is the
*tile batch* (data parallelism over tiles, §2c row "DP"), with an optional
strip-sharding mode that exchanges conv halos over ICI (§2c row "SP").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "tile_sharding", "replicated", "P", "Mesh",
           "NamedSharding"]


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D device mesh over the first ``n_devices`` (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def tile_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard a (num_tiles, ...) batch along its leading axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
