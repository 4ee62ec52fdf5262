"""Tensor parallelism for the diffusion transformer blocks (SURVEY.md §2c TP).

The reference has no TP (single device); at SD-x4 sizes TP is optional, but a
complete TPU framework must offer it for large latents / multi-chip serving.

Design — idiomatic GSPMD, not hand-written collectives: we annotate
Megatron-style shardings on the transformer weights and let XLA's SPMD
partitioner insert the (reduce-scatter/all-reduce) collectives over ICI:

  * q/k/v and GEGLU up projections: column-parallel — output dim sharded over
    the ``tp`` axis. Because attention reshapes (B, S, H*hd) head-major
    (models/diffusion/layers.py:88), sharding the projection's output dim IS
    head sharding: each chip computes a contiguous block of heads.
  * attention out-proj and GEGLU down projection: row-parallel — input dim
    sharded; XLA inserts one psum per block to rebuild the residual stream.

Everything else (convs, norms, time embeddings) is replicated — SR latents are
small enough that sharding convs spatially is the job of the strip/tile layer
(parallel/sharded.py), not TP.

Head-count divisibility: SD-x4's UNet uses 8 heads per block
(/root/reference/nesr/nesr.py:261 via diffusers config), so tp in {2,4,8}
divides every block. ``tp_spec_for`` returns None (replicate) for any tensor
whose sharded dim would not divide evenly, so partial coverage degrades
gracefully instead of erroring.

Flash-attention interaction: on TPU, long latent self-attention normally
routes into the Pallas flash kernel (kernels/attention.py attention_auto),
a custom call the SPMD partitioner cannot split over the tp axis.
``shard_transformer_params`` therefore sets ``NESR_DISABLE_FLASH_ATTENTION=1``
automatically when tp > 1 on TPU, so attention runs as XLA einsums, which
GSPMD partitions cleanly over the head-sharded dimension. The XLA path costs
more HBM for attention scores but the tp-way head split reduces per-chip
sequence memory proportionally.
"""

from __future__ import annotations

import os

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_spec_for", "shard_transformer_params", "tp_mesh"]

# Column-parallel: output (last) dim sharded. Covers self/cross attention
# q/k/v and the GEGLU up-projection (ff.net.0.proj holds [value|gate] halves —
# both halves shard evenly because proj_out = 2 * 4 * dim and GEGLU splits it
# in the middle: each half is divisible whenever 4*dim/tp is whole).
_COL_PARALLEL = re.compile(
    r"\.(attn[12]\.to_[qkv]|ff\.net\.0\.proj)\.weight$")
# Row-parallel: input (first) dim sharded; psum rebuilds the residual.
_ROW_PARALLEL = re.compile(
    r"\.(attn[12]\.to_out\.0|ff\.net\.2)\.weight$")
# Biases of column-parallel projections shard with the output dim. Row-
# parallel biases stay replicated (added once after the psum).
_COL_BIAS = re.compile(r"\.(attn[12]\.to_[qkv]|ff\.net\.0\.proj)\.bias$")


def tp_mesh(n_devices: int | None = None, axis_name: str = "tp") -> Mesh:
    """1-D TP mesh (parallel.mesh.make_mesh with a 'tp' axis)."""
    from neural_enhanced_super_resolution_tpu.parallel.mesh import make_mesh
    return make_mesh(n_devices, axis_name)


def _divides(dim_size: int, mesh: Mesh, axis_name: str) -> bool:
    return dim_size % mesh.shape[axis_name] == 0


def tp_spec_for(name: str, shape: tuple, mesh: Mesh,
                axis_name: str = "tp") -> P:
    """PartitionSpec for one diffusers-named tensor under head/FF sharding."""
    if _COL_PARALLEL.search(name) and len(shape) == 2 and \
            _divides(shape[1], mesh, axis_name):
        # GEGLU up-proj splits its output in half (value|gate); sharding is
        # only value-correct if each half shards evenly.
        if name.endswith("ff.net.0.proj.weight") and \
                (shape[1] // 2) % mesh.shape[axis_name] != 0:
            return P()
        return P(None, axis_name)
    if _ROW_PARALLEL.search(name) and len(shape) == 2 and \
            _divides(shape[0], mesh, axis_name):
        return P(axis_name, None)
    if _COL_BIAS.search(name) and len(shape) == 1 and \
            _divides(shape[0], mesh, axis_name):
        if name.endswith("ff.net.0.proj.bias") and \
                (shape[0] // 2) % mesh.shape[axis_name] != 0:
            return P()
        return P(axis_name)
    return P()


def shard_transformer_params(params: dict, mesh: Mesh,
                             axis_name: str = "tp") -> dict:
    """device_put every tensor with its TP sharding (replicate non-TP ones).

    Works on the flat diffusers-named dict used by models/diffusion/*.
    Running the existing unet_forward/vae under jit inside ``mesh`` then
    executes with Megatron-style TP — XLA inserts the psums over ICI.
    """
    if mesh.shape[axis_name] > 1 and \
            os.environ.get("NESR_DISABLE_FLASH_ATTENTION") != "1" and \
            any(d.platform == "tpu" for d in jax.devices()):
        # Auto-route attention to the XLA einsum path: the Pallas flash
        # custom call cannot be partitioned over the tp axis, and relying on
        # the operator to read a warning risks a compile-time SPMD failure
        # (ADVICE round 2). attention_auto reads this env var at trace time;
        # params are always sharded before the UNet is traced, so the switch
        # is in place for every TP execution.
        os.environ["NESR_DISABLE_FLASH_ATTENTION"] = "1"
        import logging
        logging.getLogger("nesr").info(
            "TP over %d devices on TPU: flash attention auto-disabled — "
            "attention runs as XLA einsums, which GSPMD shards over the "
            "head dimension (see parallel/tensor.py docstring)",
            mesh.shape[axis_name])
    out = {}
    for name, val in params.items():
        spec = tp_spec_for(name, tuple(val.shape), mesh, axis_name)
        out[name] = jax.device_put(val, NamedSharding(mesh, spec))
    return out
