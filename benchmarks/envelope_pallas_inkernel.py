"""In-kernel MXU rate probe: VMEM-resident matmuls at fused-RDB im2col shapes.

One pallas program holds A (M, K) in VMEM and runs `LOOPS` matmuls against
distinct weight slabs, accumulating in VMEM — no HBM traffic per matmul.
This is the ceiling for a fused whole-RDB kernel whose patches/intermediates
live in VMEM. Shapes probed:

  (1152, 640) x (640, 192)   — conv0 im2col (9*64 pad 640 -> 192)
  (1152, 320) x (320, 160)   — growth conv im2col (9*32 pad 320 -> 160)
  (1152, 768) x (768, 384)   — s2d per-subpix-row conv0 (exact 128-aligned)
  (1152, 512) x (512, 128)   — 128-aligned sanity
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_enhanced_super_resolution_tpu.runtime.device import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

LOOPS = 1024
NW = 8  # distinct weight slabs (defeats CSE, models 5 convs' weights)


def make_kernel(loops):
    def kernel(a_ref, w_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            w = w_ref[i % NW]
            acc_ref[:] += jax.lax.dot_general(
                a_ref[0], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, loops, body, 0)
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def probe(m, k, n, grid=8):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 0.05, (grid, m, k)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (NW, k, n)).astype(np.float32),
                    jnp.bfloat16)

    f = jax.jit(lambda a, w: pl.pallas_call(
        make_kernel(LOOPS),
        out_shape=jax.ShapeDtypeStruct((grid, m, n), jnp.bfloat16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, k, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
    )(a, w))

    t0 = time.time()
    float(np.asarray(jnp.sum(f(a, w))))
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jnp.sum(f(a, w))))
        best = min(best, time.time() - t0)
    fl = grid * LOOPS * 2 * m * k * n
    print(f"({m},{k})x({k},{n}): {fl / best / 1e12:7.1f} TF/s "
          f"({best * 1e3:.1f} ms, compile {comp:.0f}s)")


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} LOOPS={LOOPS}")
    # s2d per-subpix-row shapes: conv0 (768->384) + growth convs (384->N)
    probe(1152, 768, 384, grid=16)
    probe(1152, 384, 320, grid=32)
    probe(1152, 384, 256, grid=32)
    probe(1152, 384, 192, grid=32)
    probe(1152, 384, 128, grid=32)


if __name__ == "__main__":
    main()
