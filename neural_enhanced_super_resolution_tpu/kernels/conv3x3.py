"""Pallas fused 3x3 conv (+bias, +LeakyReLU) via VMEM im2col. EXPERIMENTAL.

Motivation (measured on v5e, see bench history): XLA's conv kernels reach
only ~45% of their MXU shape ceiling for RRDB's channel widths. This kernel
reformulates conv3x3 as ONE im2col matmul per row-block — contraction depth
K = 9*Cin (>=288 for every RRDB conv, fully occupying the MXU's K dimension)
— with the patch matrix built entirely in VMEM (9 static strided copies of a
DMA'd input slab), and bias + LeakyReLU fused into the epilogue.

Status: numerically exact (validated in interpret mode,
tests/test_kernels.py) but NOT yet compilable by Mosaic on v5e: the
1-pixel spatial shifts and 64-channel slices violate Mosaic's (8, 128)
memref slicing alignment on whichever axis carries them —
  * (N,H,W,C) layout: W-shifts misalign the sublane dim, C=64 < 128 lane
    tile blocks the DMA slice;
  * (N,H,W,1,C) layout: frees the spatial shifts but forces C padded to
    128, doubling matmul K for C=64 (quadrupling for C=32), erasing the win.
The production path therefore stays on XLA convs with the MXU-shaped fused
RDB reparameterisation (models/rrdbnet.py). Revisit with a layout that keeps
shifts on untiled dims while packing K: e.g. pre-unfolding ky into the
batch-of-rows dim host-side, leaving only kx shifts for lane-aligned
pltpu.roll.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_lrelu"]


def _kernel(x_hbm, w_ref, b_ref, o_ref, slab, patches, sem, *,
            bh: int, w_out: int, cin: int, negative_slope: float,
            apply_act: bool):
    i = pl.program_id(1)  # row-block index
    n = pl.program_id(0)  # batch index

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * bh, bh + 2), :, :], slab, sem)
    dma.start()
    dma.wait()

    # im2col: patches[:, (ky*3+kx)*cin : +cin] = slab[ky:ky+bh, kx:kx+w, :]
    for ky in range(3):
        for kx in range(3):
            part = slab[ky:ky + bh, kx:kx + w_out, :]
            patches[:, (ky * 3 + kx) * cin:(ky * 3 + kx + 1) * cin] = (
                part.reshape(bh * w_out, cin))

    acc = jnp.dot(patches[:], w_ref[:],
                  preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if apply_act:
        acc = jnp.where(acc >= 0, acc, negative_slope * acc)
    o_ref[0] = acc.reshape(bh, w_out, -1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "negative_slope", "apply_act",
                              "interpret"))
def _conv3x3_impl(x, w2d, bias, block_rows, negative_slope, apply_act,
                  interpret):
    n, h, w, cin = x.shape
    cout = w2d.shape[1]
    bh = block_rows
    ph = (-h) % bh
    # SAME padding + bottom padding so bh divides the height; the slab width
    # (w + 2 + pwe) must be a multiple of 8 (Mosaic sublane tiling of HBM
    # slices).
    pwe = (-(w + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + ph), (1, 1 + pwe), (0, 0)))
    grid = (n, (h + ph) // bh)

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_out=w, cin=cin,
                          negative_slope=negative_slope,
                          apply_act=apply_act),
        out_shape=jax.ShapeDtypeStruct((n, h + ph, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec((9 * cin, cout), lambda n_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda n_, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda n_, i: (n_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, w + 2 + pwe, cin), x.dtype),
            pltpu.VMEM((bh * w, 9 * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w2d, bias)
    return out[:, :h]


def conv3x3_lrelu(x: jax.Array, w: jax.Array, b: jax.Array,
                  negative_slope: float = 0.2, apply_act: bool = True,
                  block_rows: int = 16,
                  interpret: bool | None = None) -> jax.Array:
    """Fused SAME conv3x3 + bias + LeakyReLU.

    Args:
        x: (N, H, W, Cin) bf16/f32.
        w: (3, 3, Cin, Cout) HWIO weights (reshaped internally).
        b: (Cout,) bias.
    Returns (N, H, W, Cout), dtype of x.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cin, cout = w.shape[2], w.shape[3]
    w2d = w.reshape(9 * cin, cout).astype(x.dtype)
    return _conv3x3_impl(x, w2d, b.astype(jnp.float32), block_rows,
                         negative_slope, apply_act, interpret)
