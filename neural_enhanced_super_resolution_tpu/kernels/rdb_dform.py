"""Fused whole-RDB Pallas kernel, D-form edition — the production trunk conv.

Measured motivation (benchmarks/envelope_rdb_fused.py + slope-extracted
component rates on this v5e): XLA's fused-RDB trunk runs 43.9 TF/s effective
(14.5 ms per RDB per 16x288^2 tile batch); in-kernel, the same math runs at
~194-203 TF/s on the MXU once data sits in VMEM, with window builds at
~565 GB/s. Fusing the five dense-block convs per RDB into one kernel removes
the HBM round-trips between convs (the c_i tensors: ~1.7 GB per RDB per
batch) that cap the XLA path.

Layout: rows-s2d (N, A, W, 2C) with A = H/2 and channel = pi*C + c
(kernels/rdb_pallas.py to_rows_s2d). A 3x3 SAME conv C->D becomes, for each
output s2d-row a, a contraction over the *dense window*

    D[a, w, :] = [ x_s2d[a] (2C) | x[2a-1] (C) | x[2a+2] (C) ]     (4C lanes)

applied at three column shifts dc in {0,1,2}:

    out[a, w, oi*D+f] = sum_dc dot(D[a, dc+w, :], W'[dc])          K = 4C

W'[dc][q, n] = w[dr, dc, c, f] with dr = p(q) - oi + 1 (zero outside 0..2),
where p(q) in {-1, 0, 1, 2} is the x-row offset encoded by lane q. K = 4C is
MXU-pass-aligned (256 for the 64-wide trunk, 128 for the 32-wide growth
convs); the structural zeros cost the same 4/3 FLOP tax as the rows-s2d
patch (rdb_pallas.py) but the window build is 3 mostly-lane-aligned copies
instead of a 9-piece lane-misaligned im2col.

Source-major fusion (same reparameterisation as models/rrdbnet._rdb_fused):
each source x_k gets ONE conv with all destination slabs stacked on N
(384/320/256/192/128 wide), and the dense-block adds become slot
accumulators. N-order interleaves the s2d parity pairs per destination slot
(slot-major, oi within slot) so assembly slices sit at 64-lane boundaries.

Numerics: MXU accumulates f32 per conv; slot accumulators and stage
activations are stored bf16 between convs — the same bf16 materialisation
points as the XLA fused path (models/rrdbnet.py _rdb_fused casts each c_i to
bf16), except partial slot sums round pairwise instead of in one f32 chain.
Residual adds (x + 0.2*x5) run in f32.

Replaces the reference's pip-delegated CUDA convs on the hot path
(/root/reference/nesr/nesr.py:216 via basicsr RRDBNet).
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


def rdb_dform_reference(t: jax.Array, wd: dict, gc: int) -> jax.Array:
    """XLA reference of the D-form fused RDB (the kernel's exactness oracle).

    t: (N, A, W, 2C) rows-s2d bf16. wd: dform_rdb_weights output. Uses the
    same bf16 materialisation points as the kernel. Returns same shape/dtype.
    """
    g2 = 2 * gc
    w = t.shape[2]
    b = wd["b"]

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    c0 = _conv_dform(_pad1(t), wd["w0"], w)
    x1 = lrelu(c0[..., 0:g2] + b[0:g2]).astype(jnp.bfloat16)
    a2 = c0[..., g2:2 * g2].astype(jnp.bfloat16)
    a3 = c0[..., 2 * g2:3 * g2].astype(jnp.bfloat16)
    a4 = c0[..., 3 * g2:4 * g2].astype(jnp.bfloat16)
    a5 = c0[..., 4 * g2:].astype(jnp.bfloat16)

    c1 = _conv_dform(_pad1(x1), wd["w1"], w)
    x2 = lrelu(a2.astype(jnp.float32) + c1[..., 0:g2]
               + b[g2:2 * g2]).astype(jnp.bfloat16)
    a3 = (a3.astype(jnp.float32) + c1[..., g2:2 * g2]).astype(jnp.bfloat16)
    a4 = (a4.astype(jnp.float32) + c1[..., 2 * g2:3 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c1[..., 3 * g2:]).astype(jnp.bfloat16)

    c2 = _conv_dform(_pad1(x2), wd["w2"], w)
    x3 = lrelu(a3.astype(jnp.float32) + c2[..., 0:g2]
               + b[2 * g2:3 * g2]).astype(jnp.bfloat16)
    a4 = (a4.astype(jnp.float32) + c2[..., g2:2 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c2[..., 2 * g2:]).astype(jnp.bfloat16)

    c3 = _conv_dform(_pad1(x3), wd["w3"], w)
    x4 = lrelu(a4.astype(jnp.float32) + c3[..., 0:g2]
               + b[3 * g2:4 * g2]).astype(jnp.bfloat16)
    a5 = (a5.astype(jnp.float32) + c3[..., g2:]).astype(jnp.bfloat16)

    c4 = _conv_dform(_pad1(x4), wd["w4"], w)
    x5 = (a5.astype(jnp.float32) + c4
          + b[4 * g2:])
    return (t.astype(jnp.float32) + 0.2 * x5).astype(t.dtype)
