"""Row-s2d Pallas conv: the production 3x3 conv for the RRDB trunk on TPU.

Why this exists (measured on this v5e, see benchmarks/RESULTS.md round 2):
XLA's conv envelope at the fused-RDB shapes (in 64ch, out 192..64) is
~47 TF/s — the narrow channel dims leave MXU lanes idle. Reshaping the trunk
into a row-space-to-depth layout turns every 3x3 conv into one MXU matmul
with both dims 128-aligned, measured at 102-125 TF/s in-kernel:

  layout  T[n, a, w, pi*C + c] = x[n, 2a + pi, w, c]   (C x-features, 2C chans)

  A 3x3 SAME conv C->D becomes, per output y-row a and both output x-row
  parities oi stacked:

    out[a, w, oi*D + f] = sum_{dc, p, c} patch[a, w, dc*4C + p*C + c]
                            * W'[dc*4C + p*C + c, oi*D + f]

  where the patch gathers a DENSE 4-piece row window (x-row offsets -1..2,
  i.e. y-rows a-1..a+1 split into parity halves) x 3 column taps:
  K = 12C (vs the exact 9C -> a 4/3 FLOP tax, paid to keep K and N
  128-aligned and both parities in one matmul), N = 2D.

  Row-s2d never changes frames: input and output live in the same layout, so
  the fused-RDB assembly (slices + adds + LeakyReLU, models/rrdbnet.py) runs
  unchanged in XLA between kernel calls — no realignment copies (the thing
  that killed full 2D space-to-depth in XLA: benchmarks/envelope_s2d.py).

The kernel itself: grid over (batch, row-blocks); DMA the row block + 1-row
halo from HBM, build the (bh, W, 12C) patch with 12 static VMEM slice
copies, one dot_general, write bf16. SAME zero padding comes from padding
the input once in XLA (rows_s2d_pad).

Replaces the reference's pip-delegated CUDA convs
(/root/reference/nesr/nesr.py:216 via basicsr RRDBNet) on the hot path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["to_rows_s2d", "from_rows_s2d", "rearrange_w_rows_s2d",
           "rows_s2d_conv3x3", "rows_s2d_supported"]


def to_rows_s2d(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W, 2C) with ch = pi*C + c. H must be even."""
    n, h, w, c = x.shape
    return (x.reshape(n, h // 2, 2, w, c)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h // 2, w, 2 * c))


def from_rows_s2d(t: jax.Array) -> jax.Array:
    """Inverse of to_rows_s2d."""
    n, a, w, c2 = t.shape
    c = c2 // 2
    return (t.reshape(n, a, w, 2, c)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, 2 * a, w, c))


def rearrange_w_rows_s2d(w) -> np.ndarray:
    """(3, 3, C, D) HWIO -> (12C, 2D) for the row-s2d patch matmul.

    K index = dc*4C + p*C + c with row-pieces p = x-row offset -1..2;
    N index = oi*D + f. Zero where |p - 1 - (oi... dr = p - oi outside 0..2
    (each parity uses 3 of the 4 row pieces: the 4/3 tax).
    """
    w = np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    out = np.zeros((12 * cin, 2 * cout), w.dtype)
    for dc in range(3):
        for p in range(4):
            for oi in range(2):
                dr = p - oi
                if 0 <= dr <= 2:
                    k0 = dc * 4 * cin + p * cin
                    out[k0:k0 + cin, oi * cout:(oi + 1) * cout] = w[dr, dc]
    return out


def _conv_kernel(x_hbm, w_ref, o_ref, xs, patch, sems, *, bh, wout, cin2,
                 nb):
    """One row-block program on a flat (batch*row-blocks) grid, with
    double-buffered input DMA: program g prefetches block g+1's rows while
    computing its own (scratch persists across the sequential grid).

    cin2 = 2C (true, pre-pad); K = 6*cin2. The HBM array's channel dim is
    zero-padded to a 128 multiple (Mosaic requires 128-aligned minor dims for
    DMA); the patch build slices only the true parity halves, so the pad
    costs DMA bytes, never FLOPs."""
    g = pl.program_id(0)
    total = pl.num_programs(0)
    cin = cin2 // 2

    def dma(slot, gg):
        # Block gg = (batch gg//nb, rows gg%nb*bh .. +bh+2) of the padded
        # input.
        return pltpu.make_async_copy(
            x_hbm.at[gg // nb, pl.ds((gg % nb) * bh, bh + 2)],
            xs.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma((g + 1) % 2, g + 1).start()

    dma(g % 2, g).wait()
    xb = xs.at[g % 2]

    # Patch: 9 static slice copies per block (3 col taps x 3 row pieces —
    # the two middle pieces p=1,2 are one contiguous, 128-aligned copy).
    for dc in range(3):
        k0 = dc * 4 * cin
        patch[:, :, k0 + cin:k0 + 3 * cin] = xb[1:1 + bh, dc:dc + wout,
                                                0:cin2]
        patch[:, :, k0:k0 + cin] = xb[0:bh, dc:dc + wout, cin:cin2]
        patch[:, :, k0 + 3 * cin:k0 + 4 * cin] = xb[2:2 + bh, dc:dc + wout,
                                                    0:cin]

    acc = jax.lax.dot_general(
        patch[:], w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def _rows_s2d_conv_padded(xp: jax.Array, wk: jax.Array, bh: int,
                          interpret: bool) -> jax.Array:
    """xp: (N, A+2, Wp, Cp) pre-padded rows-s2d (Wp 8-aligned >= W+2, Cp
    128-aligned >= 2C); wk: (12C, 2D). W = largest multiple of 8 <= Wp-2."""
    n, ap2, wp2, cp = xp.shape
    a, wout = ap2 - 2, (wp2 - 2) // 8 * 8
    cin = wk.shape[0] // 12
    cin2 = 2 * cin
    nout = wk.shape[1]
    nb = a // bh
    return pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, wout=wout, cin2=cin2, nb=nb),
        out_shape=jax.ShapeDtypeStruct((n, a, wout, nout), jnp.bfloat16),
        grid=(n * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # manual DMA (row halo)
            pl.BlockSpec((12 * cin, nout), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wout, nout),
                               lambda g: (g // nb, g % nb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wp2, cp), jnp.bfloat16),
            pltpu.VMEM((bh, wout, 12 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wk)


def _pick_bh(a: int, wout: int, cin2: int, nout: int) -> int:
    """Largest row-block that divides A and fits the ~16 MB VMEM budget."""
    budget = 10 * 2 ** 20  # leave room for Mosaic's own stack buffers
    cp = -(-cin2 // 128) * 128
    for bh in (16, 12, 8, 6, 4, 2, 1):
        if a % bh:
            continue
        need = (2 * (bh + 2) * (wout + 8) * cp * 2   # xs (2 DMA slots)
                + bh * wout * 6 * cin2 * 2           # patch
                + 2 * bh * wout * nout * 2           # out block (pipelined)
                + bh * wout * nout * 4               # f32 matmul accumulator
                + 6 * cin2 * nout * 2)               # weights
        if need <= budget:
            return bh
    return 1


def rows_s2d_supported(cin: int, cout: int) -> bool:
    """128-alignment needed for the patch matmul to pay off."""
    return (2 * cin) % 64 == 0 and cin >= 16


def rows_s2d_conv3x3(t: jax.Array, wk: jax.Array,
                     interpret: bool | None = None,
                     bh: int | None = None) -> jax.Array:
    """3x3 SAME conv in rows-s2d layout.

    t: (N, A, W, 2C) rows-s2d bf16; wk: (12C, 2D) from rearrange_w_rows_s2d.
    Returns (N, A, W, 2D) bf16 — same layout, same frame.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, a, wout, cin2 = t.shape
    nout = wk.shape[1]
    if bh is None:
        bh = _pick_bh(a, wout, cin2, nout)
    # Mosaic requires DMA slice widths 8-aligned on the sublane dim: pad the
    # haloed width (W+2) up to a multiple of 8 (extra cols are never read).
    assert wout % 8 == 0, f"W must be a multiple of 8, got {wout}"
    wp = -(-(wout + 2) // 8) * 8
    cp = -(-cin2 // 128) * 128
    xp = jnp.pad(t.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, wp - wout - 1), (0, cp - cin2)))
    return _rows_s2d_conv_padded(xp, wk.astype(jnp.bfloat16), bh, interpret)
