"""Pallas fused conv3x3 v2 — Mosaic-aligned layout (ky-unfold + lane rolls).

Second take on the fused 3x3 conv (+bias +LeakyReLU), designed around the
Mosaic alignment rules that blocked v1 (kernels/conv3x3.py):

  * the ky dimension is pre-unfolded host-side into a leading axis of 3
    shifted row-views (XLA builds them; +2x HBM for the input — small next
    to the matmul win if it materialises);
  * kx shifts happen in-register with ``pltpu.roll`` on the sublane axis
    (no misaligned memref slices);
  * the 9 patch slabs are concatenated as *values* into a (bh*W, 9*Cin)
    operand — never stored at unaligned offsets — feeding ONE MXU matmul
    with full contraction depth K = 9*Cin.

Falls back to interpret mode off-TPU. Exactness is tested in
tests/test_kernels.py; on-TPU compile/perf status is recorded in
benchmarks/RESULTS.md.

Measured status (v5e): compiles and is numerically correct at bh=8
(maxerr ~0.016 vs lax.conv in bf16; bh=16 exceeds the 16 MB scoped-VMEM
limit), but runs at ~6.7 TF/s vs XLA conv's ~25-35 at the same shape —
too little work per program at bh=8, f32 roll copies, and no double
buffering. XLA conv remains the production path; to revisit, shrink the
live set (fold the f32 casts into the matmul operands) so bh=32 fits, and
double-buffer the row blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_lrelu_v2"]


def _kernel(x3_ref, w_ref, b_ref, o_ref, *, bh: int, w_out: int, cin: int,
            negative_slope: float, apply_act: bool, interpret: bool):
    parts = []
    for ky in range(3):
        rows = x3_ref[ky, 0]                      # (bh, Wp, C)
        # Mosaic's rotate only supports 32-bit data: roll in f32, cast back.
        rows32 = rows.astype(jnp.float32)
        for kx in range(3):
            if kx and not interpret:
                # pltpu.roll wants a non-negative shift: -kx == size - kx
                shifted = pltpu.roll(rows32, shift=rows.shape[1] - kx,
                                     axis=1).astype(rows.dtype)
            elif kx:
                shifted = jnp.roll(rows, shift=-kx, axis=1)
            else:
                shifted = rows
            part = shifted[:, :w_out, :]          # (bh, W, C)
            parts.append(part.reshape(bh * w_out, cin))
    patches = jnp.concatenate(parts, axis=-1)     # (bh*W, 9C) in registers
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if apply_act:
        acc = jnp.where(acc >= 0, acc, negative_slope * acc)
    o_ref[0] = acc.reshape(bh, w_out, -1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "negative_slope", "apply_act",
                              "interpret"))
def _impl(x, w2d, bias, block_rows, negative_slope, apply_act, interpret):
    n, h, w, cin = x.shape
    cout = w2d.shape[1]
    bh = block_rows
    ph = (-h) % bh
    pwe = (-(w + 2)) % 8  # sublane-aligned slab width
    xp = jnp.pad(x, ((0, 0), (1, 1 + ph), (1, 1 + pwe), (0, 0)))
    hp = h + ph
    wp = w + 2 + pwe
    # ky-unfold: (3, N, Hp, Wp, C) shifted row views
    x3 = jnp.stack([xp[:, ky:ky + hp] for ky in range(3)], axis=0)

    grid = (n, hp // bh)
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_out=w, cin=cin,
                          negative_slope=negative_slope, apply_act=apply_act,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((n, hp, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 1, bh, wp, cin), lambda n_, i: (0, n_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda n_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda n_, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda n_, i: (n_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, w2d, bias)
    return out[:, :h]


def conv3x3_lrelu_v2(x: jax.Array, w: jax.Array, b: jax.Array,
                     negative_slope: float = 0.2, apply_act: bool = True,
                     block_rows: int = 8,
                     interpret: bool | None = None) -> jax.Array:
    """Fused SAME conv3x3 + bias (+LeakyReLU); see module docstring."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cin, cout = w.shape[2], w.shape[3]
    w2d = w.reshape(9 * cin, cout).astype(x.dtype)
    return _impl(x, w2d, b.astype(jnp.float32), block_rows, negative_slope,
                 apply_act, interpret)
