"""Fused whole-RDB Pallas kernel, D-form edition (experimental, opt-in).

STATUS (round 3, 2026-08-17, v5e via the remote-compile tunnel): TWO
variants, both numerically validated, NEITHER beats the XLA fused trunk —
the production default stays XLA (models/rrdbnet._rdb_fused).

  v1 (round 2): 3 column-shifted f32 dots per N<=128 chunk. 37 ms/RDB
  (58 us/step) on the 16x288^2 batch vs XLA's 14.5 ms — bounded by the
  f32 cross-dot materialisation (~30 MB/step).

  v2 (round 3, roadmap item a): ONE K-concatenated dot per stage
  (K = 12*Cin, f32 MXU accumulation, single bf16 rounding = the XLA
  trunk's own rounding points; Mosaic rejects bf16 accumulators, so the
  cast follows the dot). The step BODY hits 20.3 us/step in-context
  (79.5 TF/s raw, 59.6 effective — 2.9x v1, better than XLA's 22.6
  us-equiv; benchmarks/envelope_v2_step.py). But the INTEGRATED kernel
  measures 43.2 us/step / 29.0 ms/RDB (benchmarks/envelope_dform_call.py):
  with only ~8 us of MXU work per step left, the line-buffer machinery
  (rolling carries, bf16 slot delay-lines, masked window emits — ~23 us of
  VPU stores) no longer hides behind the dot chain the way it fully did in
  v1. The schedule's serial VPU traffic, not the MXU, is now the wall;
  removing it means either block-halo recompute (>=25% extra FLOPs at
  VMEM-feasible block heights) or bh>=16 blocks whose Mosaic compiles
  (>250 s) never land in this environment's persistent cache.

  v3 (round 4, VERDICT #1): v2's stage body with the 11 rolling-carry
  moves staged on async DMA (pltpu.make_async_copy, started end-of-step,
  waited next prologue; g2-wide slot buffers lane-padded to 128 for
  Mosaic's DMA alignment). Measured IDENTICAL to v2 — 42.7 us/step both,
  same compile — proving the carries were never the binding cost: the
  emit/slot stores and K-concat lhs builds move computed register values
  and cannot ride a DMA engine. Decision record in benchmarks/RESULTS.md.

Decision: XLA trunk remains production; all variants stay in-tree,
tested (interpret-mode exactness vs per-variant oracles) and measured.
The DMA question is closed by measurement; the remaining lever (larger
row blocks) is compile-time-bound in this environment (superlinear Mosaic
compile vs block area, >250 s never persists in the cache).

Design (kept because the schedule itself is sound and fully tested):

Layout: rows-s2d (N, A, W, 2C) with A = H/2 and channel = pi*C + c
(kernels/rdb_pallas.py to_rows_s2d). A 3x3 SAME conv C->D becomes, for each
output s2d-row a, a contraction over the *dense window*

    D[a, w, :] = [ x_s2d[a] (2C) | x[2a-1] (C) | x[2a+2] (C) ]     (4C lanes)

applied at three column shifts dc in {0,1,2} with K = 4C pass-aligned.
One pallas_call runs a whole residual dense block: a sequential grid walks
row blocks, the five dense-block stages run skewed one row deeper per stage
with rolling carry buffers (zero halo recompute), stage values are written
straight into the next stage's window buffer, dense-block adds ride bf16
slot delay-lines (the XLA path's own materialisation points), and the
residual output is emitted one grid step late so every block write stays
aligned. Wide images are walked in column blocks (compile time scales
superlinearly with per-program block area; the 16-col halo arrives as two
pipelined 8-wide input blocks). I/O format is chainable call-to-call.

Replaces nothing today; the reference's hot path
(/root/reference/nesr/nesr.py:216 via basicsr RRDBNet) runs on the XLA
fused trunk (models/rrdbnet.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["rearrange_w_dform", "dform_rdb_weights", "rdb_dform_reference"]


# --------------------------------------------------------------- weights ----

def rearrange_w_dform(w, slab_sizes) -> np.ndarray:
    """(3, 3, Cin, sum(slabs)) HWIO -> (3, 4*Cin, 2*sum(slabs)) D-form.

    Output [dc, q, n]: q indexes the dense-window lane (see module doc).
    The N axis is slab-blocked with parity pairs inside each slab:
    slab s at offset 2*off_s spans [oi=0 features | oi=1 features] — i.e.
    each destination slab comes out in rows-s2d channel layout, so stage
    activations feed the next conv without any relayout.
    """
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3 and cout == sum(slab_sizes)
    out = np.zeros((3, 4 * cin, 2 * cout), np.float32)

    def p_of_q(q):
        if q < 2 * cin:          # x_s2d[a]: parities 0,1 of rows 2a, 2a+1
            return q // cin, q % cin
        if q < 3 * cin:          # x[2a-1]
            return -1, q - 2 * cin
        return 2, q - 3 * cin    # x[2a+2]

    # n-index of destination feature f (global over slabs) at parity oi
    noff = np.zeros(cout, np.int64)
    off = 0
    sizes = np.zeros(cout, np.int64)
    for s in slab_sizes:
        noff[off:off + s] = 2 * off + (np.arange(s))
        sizes[off:off + s] = s
        off += s
    f_idx = np.arange(cout)

    for dc in range(3):
        for q in range(4 * cin):
            p, c = p_of_q(q)
            for oi in range(2):
                dr = p - oi + 1
                if 0 <= dr <= 2:
                    out[dc, q, noff + oi * sizes] = w[dr, dc, c, f_idx]
    return out


# destination slab widths per source conv for the 64/32 fused RDB
_SLABS = {
    "w0": (1, 1, 1, 1, 2),   # x->(x1,x2,x3,x4,x5): g,g,g,g,2g
    "w1": (1, 1, 1, 2),
    "w2": (1, 1, 2),
    "w3": (1, 2),
    "w4": (2,),
}


def dform_rdb_weights(fused_rdb: dict) -> dict:
    """Re-lay one fused RDB's weights (w0..w4 from fuse_rrdbnet_params) into
    D-form with slab-blocked parity-paired N (see rearrange_w_dform).

    Returns {"w0".."w4": (3, 4*Cin, 2*Nslab) bf16, "b": (2*(4g+nf),) f32
    biases in the slab-paired order}.
    """
    gc = fused_rdb["w1"].shape[2]                 # growth channels
    out = {}
    for i in range(5):
        w = np.asarray(fused_rdb[f"w{i}"], np.float32)  # (3,3,Cin,Nslab)
        slabs = tuple(m * gc for m in _SLABS[f"w{i}"])
        out[f"w{i}"] = jnp.asarray(rearrange_w_dform(w, slabs), jnp.bfloat16)
    b = np.asarray(fused_rdb["b"], np.float32)    # (4g + nf,)
    nf = b.shape[0] - 4 * gc
    pieces = [np.tile(b[i * gc:(i + 1) * gc], 2) for i in range(4)]
    pieces.append(np.tile(b[4 * gc:], 2))
    out["b"] = jnp.asarray(np.concatenate(pieces), jnp.float32)
    return out


# ------------------------------------------------- reference (XLA) D-form ---

def _dwindow(x2: jax.Array, a0: int, rows: int) -> jax.Array:
    """Dense windows for s2d rows [a0, a0+rows) of x2 (N, Apad, Wpad, 2C)
    where Apad includes 1 halo row each side (index a maps to buffer a+1).

    Returns (N, rows, Wpad, 4C)."""
    c2 = x2.shape[-1]
    c = c2 // 2
    mid = jax.lax.dynamic_slice_in_dim(x2, a0 + 1, rows, axis=1)
    top = jax.lax.dynamic_slice_in_dim(x2, a0, rows, axis=1)[..., c:]
    bot = jax.lax.dynamic_slice_in_dim(x2, a0 + 2, rows, axis=1)[..., :c]
    return jnp.concatenate([mid, top, bot], axis=-1)


def _conv_dform(x2: jax.Array, wk: jax.Array, wout: int) -> jax.Array:
    """Full-extent D-form conv of a padded rows-s2d tensor.

    x2: (N, A+2, W+2, 2Cin) bf16, halo = SAME zeros. wk: (3, 4Cin, Nout).
    Returns (N, A, wout, Nout) f32."""
    a = x2.shape[1] - 2
    d = _dwindow(x2, 0, a)
    acc = None
    for dc in range(3):
        part = jnp.einsum(
            "nawk,kf->nawf", d[:, :, dc:dc + wout, :], wk[dc],
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _pad1(x: jax.Array) -> jax.Array:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def rdb_dform_reference(t: jax.Array, wd: dict, gc: int,
                        v2: bool = False) -> jax.Array:
    """XLA reference of the D-form fused RDB (the kernel's exactness oracle).

    t: (N, A, W, 2C) rows-s2d bf16. wd: dform_rdb_weights output. Uses the
    same bf16 materialisation points as the kernel. Returns same shape/dtype.

    v2=True models the round-3 kernel variant: every conv output is rounded
    to bf16 BEFORE the assembly adds (one K-concatenated dot with
    preferred_element_type=bfloat16) — exactly the XLA production trunk's
    rounding points (_rdb_fused casts each c_i to compute_dtype).
    """
    g2 = 2 * gc
    w = t.shape[2]
    b = wd["b"]

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    def conv(x, wk):
        out = _conv_dform(_pad1(x), wk, w)
        if v2:
            out = out.astype(jnp.bfloat16).astype(jnp.float32)
        return out

    c0 = conv(t, wd["w0"])
    x1 = lrelu(c0[..., 0:g2] + b[0:g2]).astype(jnp.bfloat16)
    a2 = c0[..., g2:2 * g2].astype(jnp.bfloat16)
    a3 = c0[..., 2 * g2:3 * g2].astype(jnp.bfloat16)
    a4 = c0[..., 3 * g2:4 * g2].astype(jnp.bfloat16)
    a5 = c0[..., 4 * g2:].astype(jnp.bfloat16)

    c1 = conv(x1, wd["w1"])
    x2 = lrelu(a2.astype(jnp.float32) + c1[..., 0:g2]
               + b[g2:2 * g2]).astype(jnp.bfloat16)
    a3 = (a3.astype(jnp.float32) + c1[..., g2:2 * g2]).astype(jnp.bfloat16)
    a4 = (a4.astype(jnp.float32) + c1[..., 2 * g2:3 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c1[..., 3 * g2:]).astype(jnp.bfloat16)

    c2 = conv(x2, wd["w2"])
    x3 = lrelu(a3.astype(jnp.float32) + c2[..., 0:g2]
               + b[2 * g2:3 * g2]).astype(jnp.bfloat16)
    a4 = (a4.astype(jnp.float32) + c2[..., g2:2 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c2[..., 2 * g2:]).astype(jnp.bfloat16)

    c3 = conv(x3, wd["w3"])
    x4 = lrelu(a4.astype(jnp.float32) + c3[..., 0:g2]
               + b[3 * g2:4 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c3[..., g2:]).astype(jnp.bfloat16)

    c4 = conv(x4, wd["w4"])
    x5 = (a5.astype(jnp.float32) + c4
          + b[4 * g2:])
    return (t.astype(jnp.float32) + 0.2 * x5).astype(t.dtype)


# ----------------------------------------------------------- the kernel -----
#
# Line-buffered schedule: a sequential grid walks row blocks of bh s2d rows;
# the five dense-block stages run skewed one row deeper per stage, carrying
# their last rows in small rolling VMEM buffers so nothing is recomputed:
#
#   step g delivers input rows  [X-bh, X)          with X = g*bh + bh - IOFF
#   stage k computes x_k rows   [X-bh-k, X-k)      (k = 1..5)
#   the residual output covers  [X-bh-5, X-5)
#
# Stage values are written straight into next-stage dense-window buffers
# (D_k, rows bh+2: mid/top/bot slots — the im2col never reads a source
# buffer). Dense-block adds ride slot delay buffers A_m (rows bh+m-1, bf16,
# matching the XLA path's bf16 materialisation of each c_i). All row indices
# are static; validity at the image border is restored by iota masks (an
# invalid row/col writes exact SAME-semantics zeros, so the bias term never
# leaks past the image edge).
#
# I/O format (chainable call-to-call with ZERO XLA glue): (N, AP, WBP, 2C)
# bf16, content at rows [IOFF, IOFF+A) and cols [8, 8+W), zeros elsewhere,
# with IOFF = 10, AP = (ceil((A+IOFF)/bh)+1)*bh, WBP = 8 + W + pad. The
# output block for format rows [g*bh, (g+1)*bh) is emitted one step late
# through a modular out index map; step 0 emits the (all-zero) last block.

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IOFF = 10  # rows of format lead: 5 stage-skew + 5 output lag
WBW_MAX = 144  # max W-block width: Mosaic compile time grows superlinearly
               # with the per-program block area (measured 140 s at 8x112 vs
               # 1004 s at 8x304), so wide images are walked in column blocks


def pick_wbw(w: int) -> int:
    """Widest multiple-of-8 block width <= WBW_MAX minimising overhang."""
    if w <= WBW_MAX:
        return -(-w // 8) * 8
    best, best_over = WBW_MAX, None
    for cand in range(WBW_MAX, 63, -8):
        over = (-w) % cand
        if best_over is None or over < best_over:
            best, best_over = cand, over
            if over == 0:
                break
    return best


def dform_format_shape(n, a, w, c2, bh=8):
    nsteps = -(-(a + IOFF) // bh) + 1
    wbw = pick_wbw(w)
    nwb = -(-w // wbw)
    wf = 8 + nwb * wbw + 8
    return (n, nsteps * bh, wf, c2), nsteps


def to_dform(t: jax.Array, bh: int = 8) -> jax.Array:
    """(N, A, W, 2C) rows-s2d -> the kernel's padded I/O format."""
    n, a, w, c2 = t.shape
    (n_, ap, wf, _), _ = dform_format_shape(n, a, w, c2, bh)
    return jnp.pad(t, ((0, 0), (IOFF, ap - a - IOFF), (8, wf - w - 8),
                       (0, 0)))


def from_dform(x: jax.Array, a: int, w: int) -> jax.Array:
    return x[:, IOFF:IOFF + a, 8:8 + w, :]


def _mk_kernel(*, bh, wbw, a, w, c, g, nsteps, variant="v1"):
    """Kernel factory. c = trunk feats (64), g = growth (32).

    Grid (n, nwb, nsteps): column blocks of wbw content columns each, with a
    16-column halo delivered as two extra 8-wide pipelined input blocks.

    variant "v1": three column-shifted dots per N<=128 chunk, f32 outputs,
    f32 cross-dot adds (round-2 kernel; 1 bf16 ulp vs oracle, bounded by
    ~30 MB/step of f32 VMEM materialisation).
    variant "v2" (round-3 retry, RESULTS.md roadmap item a): ONE
    K-concatenated dot per stage over K = 12*Cin with
    preferred_element_type=bfloat16 — the MXU accumulates the whole window
    reduction in f32 and rounds once, matching the XLA production trunk's
    rounding points (_rdb_fused), and the per-step f32 traffic drops to a
    single bf16 output per stage plus the lhs builds.
    """
    c2, g2 = 2 * c, 2 * g
    wbp = wbw + 16                       # per-block buffer width
    ro = 2 * bh - 5                      # output lag buffer rows

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    def kernel(in_ref, h1_ref, h2_ref, w0, w1, w2, w3, w4, b_ref, o_ref,
               b0, d0, d1, d2, d3, d4, a2, a3, a4, a5, ob, *maybe_sems):
        wb = pl.program_id(1)
        gi = pl.program_id(2)
        dks = (d0, d1, d2, d3, d4)
        aks = (None, None, a2, a3, a4, a5)

        def carry_copies():
            """v3: the 11 rolling-carry moves as async (DMA-engine) copies.

            Descriptors are rebuilt identically at start (end of step g) and
            wait (prologue of step g+1) — the documented cross-step Pallas
            DMA pattern. Sources are rows written during step g; nothing
            touches them until the matching wait, so values equal v2's
            synchronous prologue copies exactly."""
            sems = maybe_sems[0]
            cps = [pltpu.make_async_copy(b0.at[bh:bh + 5], b0.at[0:5],
                                         sems.at[0])]
            for i, dk in enumerate(dks):
                cps.append(pltpu.make_async_copy(
                    dk.at[bh:bh + 2], dk.at[0:2], sems.at[1 + i]))
            for j, (m, ak) in enumerate(((2, a2), (3, a3), (4, a4),
                                         (5, a5))):
                cps.append(pltpu.make_async_copy(
                    ak.at[bh:bh + m - 1], ak.at[0:m - 1], sems.at[6 + j]))
            cps.append(pltpu.make_async_copy(ob.at[bh:ro], ob.at[0:ro - bh],
                                             sems.at[10]))
            return cps

        # ---- prologue: reset at the start of each (n, column-block) walk
        @pl.when(gi == 0)
        def _():
            for ref in (b0, d0, d1, d2, d3, d4, a2, a3, a4, a5, ob):
                ref[:] = jnp.zeros_like(ref)

        if variant == "v3":
            # carries were STARTED at the end of the previous step and ran
            # on the DMA engines across the step boundary; only the waits
            # (cheap when already complete) sit on the critical path.
            @pl.when(gi > 0)
            def _():
                for cp in carry_copies():
                    cp.wait()
        else:
            @pl.when(gi > 0)
            def _():
                b0[0:5] = b0[bh:bh + 5]
                for dk in dks:
                    dk[0:2] = dk[bh:bh + 2]
                for m, ak in ((2, a2), (3, a3), (4, a4), (5, a5)):
                    ak[0:m - 1] = ak[bh:bh + m - 1]
                ob[0:ro - bh] = ob[bh:ro]

        # ---- ingest input rows [X-bh, X): residual buffer + conv0 windows
        b0[5:5 + bh, 0:wbw] = in_ref[0]
        b0[5:5 + bh, wbw:wbw + 8] = h1_ref[0]
        b0[5:5 + bh, wbw + 8:wbw + 16] = h2_ref[0]
        v = b0[5:5 + bh]
        d0[1:1 + bh, :, 0:c2] = v
        d0[2:2 + bh, :, c2:c2 + c] = v[:, :, c:c2]
        d0[0:bh, :, c2 + c:2 * c2] = v[:, :, 0:c]

        # validity masks: content rows [0, a), content cols [0, w).
        # Local col j of block wb is format col wb*wbw + j = content col
        # wb*wbw + j - 8.
        col = (jax.lax.broadcasted_iota(jnp.int32, (1, wbp, 1), 1)
               + wb * wbw - 8)
        colmask = (col >= 0) & (col < w)

        def rowmask(k):
            r = (jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
                 + gi * bh - IOFF - k)
            return (r >= 0) & (r < a)

        # Uniform column extent for every stage: compute cols [1, wbp-1).
        # Reading a never-written border column yields zero, which IS the
        # SAME-semantics value there (content validity is enforced by the
        # masks), so no per-stage column shrinking is needed — one slice
        # geometry for all fifteen dots.
        e = wbp - 2

        def conv(dk, wk, k, n0, n1):
            """One N-chunk of stage k's conv: sum of 3 col-shifted dots.

            Operands are flattened to 2-D (M, K): Mosaic lowers the 3-D
            (rows, cols, K) form as many small per-row matmuls, measured
            ~4x slower than the flattened single matmul."""
            kdim = dk.shape[-1]
            acc = None
            for dc in range(3):
                lhs = dk[0:bh, dc:dc + e, :].reshape(bh * e, kdim)
                part = jax.lax.dot_general(
                    lhs, wk[dc, :, n0:n1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            return acc.reshape(bh, e, n1 - n0)

        def emit_stage(k, xk):
            """Mask + write stage k's activation into its window buffer.

            Sliced stores at the stage's column extent [k, wbp-k); the halo
            columns stay zero from the step-0 reset (never written)."""
            xk = jnp.where(rowmask(k) & colmask[:, 1:wbp - 1, :], xk,
                           jnp.zeros((), xk.dtype)).astype(jnp.bfloat16)
            dk = dks[k]
            dk[1:1 + bh, 1:wbp - 1, 0:g2] = xk
            dk[2:2 + bh, 1:wbp - 1, g2:g2 + g] = xk[:, :, g:g2]
            dk[0:bh, 1:wbp - 1, g2 + g:2 * g2] = xk[:, :, 0:g]

        def slot_add(m, k, slab, first):
            """Accumulate stage k's slab into slot m (bf16, f32 adds).

            Content lanes only (0:width): under v3 the g2-wide slot buffers
            are padded to 128 lanes so their carry DMAs meet Mosaic's
            lane-tiling alignment; pad lanes stay zero from the step-0
            reset and are never read."""
            ak = aks[m]
            cw = slab.shape[-1]
            lo, hi = 1, wbp - 1
            if first:
                ak[m - k:m - k + bh, lo:hi, 0:cw] = slab.astype(jnp.bfloat16)
            else:
                ak[m - k:m - k + bh, lo:hi, 0:cw] = (
                    ak[m - k:m - k + bh, lo:hi, 0:cw].astype(jnp.float32)
                    + slab).astype(jnp.bfloat16)

        def kc(dk, wk):
            """v2: one K-concatenated dot per stage, bf16 output.

            lhs = [shift0 | shift1 | shift2] along K (matches the
            (3, 4Cin, N) -> (12Cin, N) weight reshape); the MXU reduces all
            of K in f32 and rounds once to bf16 — no cross-dot f32 adds."""
            kdim = dk.shape[-1]
            m = bh * e
            lhs = jnp.concatenate(
                [dk[0:bh, dc:dc + e, :].reshape(m, kdim) for dc in range(3)],
                axis=1)
            # Mosaic requires a 32-bit matmul accumulator
            # ('Expected matmul acc to be 32-bit'), so the single bf16
            # rounding happens via an explicit cast of the one f32 result.
            out = jax.lax.dot_general(
                lhs, wk[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return out.reshape(bh, e, wk.shape[-1])

        bias = b_ref[0]
        f32 = jnp.float32

        if variant in ("v2", "v3"):
            # ---- stage 1: conv0 (x -> all slabs), one dot N = 12g
            s0 = kc(d0, w0)
            emit_stage(1, lrelu(s0[:, :, 0:g2].astype(f32) + bias[0:g2]))
            slot_add(2, 1, s0[:, :, g2:2 * g2], True)
            slot_add(3, 1, s0[:, :, 2 * g2:3 * g2], True)
            slot_add(4, 1, s0[:, :, 3 * g2:4 * g2], True)
            slot_add(5, 1, s0[:, :, 4 * g2:], True)

            # ---- stage 2: conv1 (x1 -> x2..x5), one dot N = 10g
            s1 = kc(d1, w1)
            emit_stage(2, lrelu(a2[0:bh, 1:wbp - 1, 0:g2].astype(f32)
                                + s1[:, :, 0:g2].astype(f32)
                                + bias[g2:2 * g2]))
            slot_add(3, 2, s1[:, :, g2:2 * g2], False)
            slot_add(4, 2, s1[:, :, 2 * g2:3 * g2], False)
            slot_add(5, 2, s1[:, :, 3 * g2:], False)

            # ---- stage 3: conv2 (x2 -> x3..x5), one dot N = 8g
            s2 = kc(d2, w2)
            emit_stage(3, lrelu(a3[0:bh, 1:wbp - 1, 0:g2].astype(f32)
                                + s2[:, :, 0:g2].astype(f32)
                                + bias[2 * g2:3 * g2]))
            slot_add(4, 3, s2[:, :, g2:2 * g2], False)
            slot_add(5, 3, s2[:, :, 2 * g2:], False)

            # ---- stage 4: conv3 (x3 -> x4, x5), one dot N = 6g
            s3 = kc(d3, w3)
            emit_stage(4, lrelu(a4[0:bh, 1:wbp - 1, 0:g2].astype(f32)
                                + s3[:, :, 0:g2].astype(f32)
                                + bias[3 * g2:4 * g2]))
            slot_add(5, 4, s3[:, :, g2:], False)

            # ---- stage 5: conv4 (x4 -> x5) + residual output
            c41 = kc(d4, w4).astype(f32)
        else:
            # ---- stage 1: conv0 (x -> all slabs), N = 12g in 3 chunks
            c01 = conv(d0, w0, 1, 0, 4 * g)              # [x1 | x2]
            emit_stage(1, lrelu(c01[:, :, 0:g2] + bias[0:g2]))
            slot_add(2, 1, c01[:, :, g2:2 * g2], True)
            c02 = conv(d0, w0, 1, 4 * g, 8 * g)          # [x3 | x4]
            slot_add(3, 1, c02[:, :, 0:g2], True)
            slot_add(4, 1, c02[:, :, g2:2 * g2], True)
            c03 = conv(d0, w0, 1, 8 * g, 12 * g)         # [x5]
            slot_add(5, 1, c03, True)

            # ---- stage 2: conv1 (x1 -> x2..x5), N = 10g in 2 chunks
            c11 = conv(d1, w1, 2, 0, 4 * g)              # [x2 | x3]
            x2 = lrelu(a2[0:bh, 1:wbp - 1, 0:g2].astype(jnp.float32)
                       + c11[:, :, 0:g2] + bias[g2:2 * g2])
            emit_stage(2, x2)
            slot_add(3, 2, c11[:, :, g2:2 * g2], False)
            c12 = conv(d1, w1, 2, 4 * g, 10 * g)         # [x4 | x5]
            slot_add(4, 2, c12[:, :, 0:g2], False)
            slot_add(5, 2, c12[:, :, g2:], False)

            # ---- stage 3: conv2 (x2 -> x3..x5), N = 8g in 2 chunks
            c21 = conv(d2, w2, 3, 0, 4 * g)              # [x3 | x4]
            x3 = lrelu(a3[0:bh, 1:wbp - 1, 0:g2].astype(jnp.float32)
                       + c21[:, :, 0:g2] + bias[2 * g2:3 * g2])
            emit_stage(3, x3)
            slot_add(4, 3, c21[:, :, g2:2 * g2], False)
            c22 = conv(d2, w2, 3, 4 * g, 8 * g)          # [x5]
            slot_add(5, 3, c22, False)

            # ---- stage 4: conv3 (x3 -> x4, x5), N = 6g in 1 chunk
            c31 = conv(d3, w3, 4, 0, 6 * g)
            x4 = lrelu(a4[0:bh, 1:wbp - 1, 0:g2].astype(jnp.float32)
                       + c31[:, :, 0:g2] + bias[3 * g2:4 * g2])
            emit_stage(4, x4)
            slot_add(5, 4, c31[:, :, g2:], False)

            # ---- stage 5: conv4 (x4 -> x5) + residual output
            c41 = conv(d4, w4, 5, 0, 2 * c)

        x5 = (a5[0:bh, 1:wbp - 1, 0:c2].astype(jnp.float32) + c41
              + bias[4 * g2:])
        res = (b0[0:bh, 1:wbp - 1, :].astype(jnp.float32)
               + 0.2 * x5)
        res = jnp.where(rowmask(5) & colmask[:, 1:wbp - 1, :], res,
                        jnp.zeros((), res.dtype))
        ob[ro - bh:ro, 1:wbp - 1, :] = res.astype(jnp.bfloat16)

        # ---- emit output block g-1 (step 0 emits the all-zero last block)
        o_ref[0] = ob[0:bh, 8:8 + wbw]

        if variant == "v3":
            @pl.when(gi < nsteps - 1)
            def _():
                for cp in carry_copies():
                    cp.start()

    return kernel


@functools.partial(jax.jit, static_argnames=("a", "w", "bh", "interpret",
                                             "variant"))
def rdb_dform_call(x: jax.Array, wd: dict, a: int, w: int, bh: int = 8,
                   interpret: bool | None = None,
                   variant: str = "v2") -> jax.Array:
    """One fused RDB on a kernel-format tensor (same format out).

    x: (N, AP, WF, 2C) bf16 from to_dform; wd: dform_rdb_weights output.
    variant: see _mk_kernel ("v2" = K-concat bf16 dots, the default;
    "v1" = round-2 shifted f32 dots).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, ap, wf, c2 = x.shape
    c = c2 // 2
    g = wd["w1"].shape[1] // 4
    nsteps = ap // bh
    g2 = 2 * g
    ro = 2 * bh - 5
    wbw = pick_wbw(w)
    nwb = (wf - 16) // wbw
    wbp = wbw + 16

    kern = _mk_kernel(bh=bh, wbw=wbw, a=a, w=w, c=c, g=g, nsteps=nsteps,
                      variant=variant)
    if variant in ("v2", "v3"):
        # (3, 4Cin, N) -> (12Cin, N): K-major concat of the three column
        # shifts, matching the kernel's lhs build order.
        wd = dict(wd, **{f"w{i}": wd[f"w{i}"].reshape(
            -1, wd[f"w{i}"].shape[-1]) for i in range(5)})
    wspec = [pl.BlockSpec(wd[f"w{i}"].shape, (lambda nd: lambda ni, wi, gi:
             (0,) * nd)(wd[f"w{i}"].ndim), memory_space=pltpu.VMEM)
             for i in range(5)]
    bias2d = wd["b"][None, :]
    assert wbw % 8 == 0 and wf == 8 + nwb * wbw + 8
    # Under v3 the g2-wide slot buffers pad their lane dim to a 128
    # multiple: Mosaic requires DMA slices lane-aligned to the (8,128)
    # tiling, and the carry DMAs copy full buffer width.
    ga = (-(-g2 // 128) * 128 if variant == "v3" and not interpret else g2)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, ap, nwb * wbw, c2), jnp.bfloat16),
        grid=(n, nwb, nsteps),
        in_specs=[
            # main block: format cols [wb*wbw, (wb+1)*wbw)
            pl.BlockSpec((1, bh, wbw, c2),
                         lambda ni, wi, gi: (ni, gi, wi, 0),
                         memory_space=pltpu.VMEM),
            # 16-col halo as two 8-wide blocks at (wb+1)*wbw, +8
            pl.BlockSpec((1, bh, 8, c2),
                         lambda ni, wi, gi: (ni, gi, (wi + 1) * (wbw // 8),
                                             0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, 8, c2),
                         lambda ni, wi, gi: (ni, gi,
                                             (wi + 1) * (wbw // 8) + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
        + wspec
        + [pl.BlockSpec(bias2d.shape, lambda ni, wi, gi: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, bh, wbw, c2),
            lambda ni, wi, gi: (ni, (gi + nsteps - 1) % nsteps, wi, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 5, wbp, c2), jnp.bfloat16),          # b0
            pltpu.VMEM((bh + 2, wbp, 2 * c2), jnp.bfloat16),      # d0
            pltpu.VMEM((bh + 2, wbp, 2 * g2), jnp.bfloat16),      # d1
            pltpu.VMEM((bh + 2, wbp, 2 * g2), jnp.bfloat16),      # d2
            pltpu.VMEM((bh + 2, wbp, 2 * g2), jnp.bfloat16),      # d3
            pltpu.VMEM((bh + 2, wbp, 2 * g2), jnp.bfloat16),      # d4
            pltpu.VMEM((bh + 1, wbp, ga), jnp.bfloat16),          # a2
            pltpu.VMEM((bh + 2, wbp, ga), jnp.bfloat16),          # a3
            pltpu.VMEM((bh + 3, wbp, ga), jnp.bfloat16),          # a4
            pltpu.VMEM((bh + 4, wbp, c2), jnp.bfloat16),          # a5
            pltpu.VMEM((ro, wbp, c2), jnp.bfloat16),              # ob
        ] + ([pltpu.SemaphoreType.DMA((11,))] if variant == "v3" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, *[wd[f"w{i}"] for i in range(5)], bias2d)
    # restore the chainable format: the out array is in content columns
    return jnp.pad(out, ((0, 0), (0, 0), (8, 8), (0, 0)))
