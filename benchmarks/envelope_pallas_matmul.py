"""Pallas matmul ceiling probe for this v5e (axon tunnel).

The candidate fused-RDB kernel reduces every conv to im2col matmuls shaped
(positions, 768) x (768, 384) and (positions, 384) x (384, out). This probe
measures what raw Pallas matmuls reach here, fetch-timed:

  1. big square (2048^3), blocked 512x512x2048 — MXU sanity ceiling
  2. the RDB shape: (2304, 768) x (768, 384), grid over M
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


def matmul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_matmul(a, b, bm, bn):
    m, k = a.shape
    n = b.shape[1]
    return pl.pallas_call(
        matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a, b)


def timed(fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.time()
    float(np.asarray(jnp.sum(f(*args))))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(jnp.sum(f(*args))))
        best = min(best, time.time() - t0)
    return best, compile_s


def main():
    rng = np.random.default_rng(0)
    REPS = 24

    run_square = os.environ.get('SQUARE', '0') == '1'
    # 1) big square, chained
    m = kk = n = 4096
    a = jnp.asarray(rng.normal(0, 0.05, (m, kk)).astype(np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (kk, n)).astype(np.float32),
                    jnp.bfloat16)

    def chain_sq(a, b):
        x = a
        for _ in range(REPS):
            x = pallas_matmul(x, b, 256, 512)
        return x

    t, c = (None, None)
    if run_square:
        t, c = timed(chain_sq, a, b)
    if run_square:
        fl = REPS * 2 * m * kk * n
        print(f"pallas 4096^3 chain:   {fl / t / 1e12:7.1f} TF/s "
              f"({t * 1e3:.1f} ms, compile {c:.0f}s)")

    # XLA comparison
    def chain_sq_xla(a, b):
        x = a
        for _ in range(REPS):
            x = jnp.dot(x, b, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        return x

    if run_square:
        t, c = timed(chain_sq_xla, a, b)
        print(f"XLA    4096^3 chain:   {fl / t / 1e12:7.1f} TF/s "
              f"({t * 1e3:.1f} ms, compile {c:.0f}s)")

    # 2) RDB conv shape, grid over a big M (= 16 batch * 8 rows * 144 cols)
    M, K, N = 16 * 8 * 144 * 4, 768, 384
    a2 = jnp.asarray(rng.normal(0, 0.05, (M, K)).astype(np.float32),
                     jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.05, (K, N)).astype(np.float32),
                     jnp.bfloat16)

    RDB_REPS = 96
    b2b = jnp.asarray(rng.normal(0, 0.05, (N, K)).astype(np.float32),
                      jnp.bfloat16)

    def chain_rdb(a, b, bb):
        x = a
        for _ in range(RDB_REPS // 2):  # alternate K->N->K so reps chain
            x = pallas_matmul(x, b, 1152, 384)
            x = pallas_matmul(x, bb, 1152, 768)
        return x

    t, c = timed(chain_rdb, a2, b2, b2b)
    fl = RDB_REPS * 2 * M * K * N
    print(f"pallas (73728,768,384): {fl / t / 1e12:6.1f} TF/s "
          f"({t * 1e3:.1f} ms, compile {c:.0f}s)")


if __name__ == "__main__":
    main()
