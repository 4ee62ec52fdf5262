"""In-kernel rate probe for a fused whole-RDB Pallas kernel (D-form design).

Design under test (production version: kernels/rdb_fused.py): rows-s2d layout
(N, A, W, 2C); per conv, build a dense-window tensor
    D[a, w, :] = [x_rows 2a..2a+1 (=s2d row a) | 2a-1 | 2a+2]   (4C lanes)
with 3 mostly-lane-aligned copies, then accumulate 3 column-shifted matmuls
    c += dot(D[:, dc:dc+W, :], Wdc)        K = 4C (pass-aligned), dc in 0..2
Source-major fusion keeps N wide (384/320/256/192/128). Dense-block slice
adds go into per-destination f32 slot accumulators so each conv's output is
consumed immediately (keeping c1..c3 alive as f32 values blows the 16 MB
VMEM budget — measured Mosaic compile failure).

This probe runs the full fused-RDB body on a RESIDENT row block (no HBM DMA,
no halo carry) and reports ms per RDB-equivalent and effective TF/s against
the exact 9C FLOP count — the go/no-go number for the production kernel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("NESR_COMPILE_CACHE_DIR",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "nesr-jax"))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_enhanced_super_resolution_tpu.runtime.device import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

C = 64          # trunk features
G = 32          # growth
W = 288         # tile width
LOOPS = 32      # RDB iterations per kernel invocation


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def make_kernel(bh, w2, loops):
    wout = w2 - 2

    def build_d(xbuf, d_ref, c2):
        c = c2 // 2
        d_ref[:, :, 0:c2] = xbuf[1:1 + bh, :, :]
        d_ref[:, :, c2:c2 + c] = xbuf[0:bh, :, c:c2]
        d_ref[:, :, c2 + c:2 * c2] = xbuf[2:2 + bh, :, 0:c]

    def conv_d(d_ref, w_ref):
        acc = jax.lax.dot_general(
            d_ref[:, 0:wout, :], w_ref[0],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            d_ref[:, 1:1 + wout, :], w_ref[1],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            d_ref[:, 2:2 + wout, :], w_ref[2],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc

    def kernel(x_ref, w0_ref, w1_ref, w2_ref, w3_ref, w4_ref, o_ref,
               xb, d0, dg, xg, a2, a3, a4, a5):
        xb[:] = x_ref[0]

        def body(i, carry):
            # conv0: source x (2C lanes) -> N=384 = [x1 x2 x3 x4 | x5(2C)]
            build_d(xb, d0, 2 * C)
            c = conv_d(d0, w0_ref)                      # (bh, wout, 12G) f32
            a2[:] = c[:, :, 2 * G:4 * G]
            a3[:] = c[:, :, 4 * G:6 * G]
            a4[:] = c[:, :, 6 * G:8 * G]
            a5[:] = c[:, :, 8 * G:]
            xg[1:1 + bh, 1:1 + wout, :] = _lrelu(
                c[:, :, 0:2 * G]).astype(jnp.bfloat16)

            # conv1: source x1 -> N=320 = [x2 x3 x4 | x5]
            build_d(xg, dg, 2 * G)
            c = conv_d(dg, w1_ref)
            x2 = _lrelu(a2[:] + c[:, :, 0:2 * G])
            a3[:] += c[:, :, 2 * G:4 * G]
            a4[:] += c[:, :, 4 * G:6 * G]
            a5[:] += c[:, :, 6 * G:]
            xg[1:1 + bh, 1:1 + wout, :] = x2.astype(jnp.bfloat16)

            # conv2: source x2 -> N=256 = [x3 x4 | x5]
            build_d(xg, dg, 2 * G)
            c = conv_d(dg, w2_ref)
            x3 = _lrelu(a3[:] + c[:, :, 0:2 * G])
            a4[:] += c[:, :, 2 * G:4 * G]
            a5[:] += c[:, :, 4 * G:]
            xg[1:1 + bh, 1:1 + wout, :] = x3.astype(jnp.bfloat16)

            # conv3: source x3 -> N=192 = [x4 | x5]
            build_d(xg, dg, 2 * G)
            c = conv_d(dg, w3_ref)
            x4 = _lrelu(a4[:] + c[:, :, 0:2 * G])
            a5[:] += c[:, :, 2 * G:]
            xg[1:1 + bh, 1:1 + wout, :] = x4.astype(jnp.bfloat16)

            # conv4: source x4 -> N=128 = [x5]
            build_d(xg, dg, 2 * G)
            c = conv_d(dg, w4_ref)
            # residual: x += 0.2 * x5
            xb[1:1 + bh, 1:1 + wout, :] = (
                xb[1:1 + bh, 1:1 + wout, :]
                + (0.2 * (a5[:] + c)).astype(jnp.bfloat16))
            return carry

        jax.lax.fori_loop(0, loops, body, 0)
        o_ref[0] = xb[1:1 + bh, 1:1 + wout, :]

    return kernel


def probe(bh, grid=8, loops=None):
    loops = loops or LOOPS
    w2 = W + 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.1, (grid, bh + 2, w2, 2 * C))
                    .astype(np.float32), jnp.bfloat16)
    wts = []
    for nout, cin in ((12 * G, C), (10 * G, G), (8 * G, G), (6 * G, G),
                      (4 * G, G)):
        wts.append(jnp.asarray(
            rng.normal(0, 0.02, (3, 4 * cin, nout)).astype(np.float32),
            jnp.bfloat16))

    wout = w2 - 2
    f = jax.jit(lambda x, *w: pl.pallas_call(
        make_kernel(bh, w2, loops),
        out_shape=jax.ShapeDtypeStruct((grid, bh, wout, 2 * C), jnp.bfloat16),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, bh + 2, w2, 2 * C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(wt.shape, lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM) for wt in wts],
        out_specs=pl.BlockSpec((1, bh, wout, 2 * C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, w2, 2 * C), jnp.bfloat16),    # xb
            pltpu.VMEM((bh, w2, 4 * C), jnp.bfloat16),        # d0
            pltpu.VMEM((bh, w2, 4 * G), jnp.bfloat16),        # dg (reused)
            pltpu.VMEM((bh + 2, w2, 2 * G), jnp.bfloat16),    # xg (reused)
            pltpu.VMEM((bh, wout, 2 * G), jnp.float32),       # a2
            pltpu.VMEM((bh, wout, 2 * G), jnp.float32),       # a3
            pltpu.VMEM((bh, wout, 2 * G), jnp.float32),       # a4
            pltpu.VMEM((bh, wout, 2 * C), jnp.float32),       # a5
        ],
    )(x, *w))

    t0 = time.time()
    float(np.asarray(jnp.sum(f(x, *wts).astype(jnp.float32))))
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jnp.sum(f(x, *wts).astype(jnp.float32))))
        best = min(best, time.time() - t0)

    # exact 9C FLOPs per image pixel for the five fused convs
    px = grid * loops * bh * 2 * wout
    exact_fl = px * 479_232  # 9*2*(64*192+32*160+32*128+32*96+32*64)
    raw_fl = exact_fl * 4 / 3
    # full-batch-equivalent time per RDB (M = 16*144*288 rows)
    rdb_ms = best / (grid * loops) * (16 * 144 / bh) * 1e3
    print(f"bh={bh:3d} grid={grid}: {best*1e3:7.1f} ms  "
          f"exact {exact_fl/best/1e12:6.1f} TF/s  raw {raw_fl/best/1e12:6.1f}"
          f"  ->{rdb_ms:6.2f} ms/RDB-batch16  (compile {comp:.0f}s)")


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} W={W} LOOPS={LOOPS}")
    for bh in (8, 16, 24):
        try:
            probe(bh)
        except Exception as e:
            print(f"bh={bh}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
