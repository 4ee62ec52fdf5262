"""Expert-parallel ensemble: members on disjoint device subsets, psum-combined.

The reference's ensemble is a sequential loop over model outputs on one
device (_ensemble_results, /root/reference/nesr/nesr.py:1033-1054). The
TPU-native form (SURVEY.md §2c row "EP"): each mesh slot holds ONE ensemble
member's parameters (stacked pytree sharded on the member axis), every member
processes the same replicated image, and the weighted average is a single
``psum`` over ICI — one collective, no host gather.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["ensemble_members_sharded"]


def ensemble_members_sharded(model_fn: Callable, stacked_params, image,
                             mesh: Mesh, weights=None,
                             axis_name: str = "dp") -> jax.Array:
    """Run one ensemble member per mesh slot and psum-average the outputs.

    Args:
        model_fn: (params, (H, W, C) image) -> (H', W', C') float32 output.
        stacked_params: pytree whose leaves have a leading member axis of
            size == mesh size (one member per device).
        image: (H, W, C) input, replicated to every member.
        weights: optional (num_members,) member weights (default: uniform).
        mesh: 1-D device mesh.

    Returns:
        (H', W', C') weighted-average output (replicated).
    """
    n = mesh.devices.size
    if weights is None:
        weights = jnp.full((n,), 1.0 / n, jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)

    def member(params_slice, w_slice, img):
        # params_slice leaves have leading dim 1 (this member's shard).
        params_local = jax.tree.map(lambda a: a[0], params_slice)
        out = model_fn(params_local, img).astype(jnp.float32)
        out = out * w_slice[0]
        return lax.psum(out, axis_name)  # ICI all-reduce across members

    sharded = shard_map(
        member, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=P(),
    )
    return sharded(stacked_params, weights, jnp.asarray(image))
