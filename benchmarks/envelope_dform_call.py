#!/usr/bin/env python3
"""Isolate the real rdb_dform_call per-RDB cost at bench shapes.

The v2 step-body probe (envelope_v2_step.py) measures 20.3 us/step =>
13 ms/RDB predicted at the bench geometry (16 x 288^2, grid 16x2x20), but
the integrated bench implies ~28 ms/RDB. This slope-times a chained fori
loop of real rdb_dform_call invocations (same format in/out) to split
kernel-internal cost from scan/pad glue.

Run ON TPU: python benchmarks/envelope_dform_call.py [v2|v1]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "v2"
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        dform_rdb_weights, to_dform)
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        to_rows_s2d)
    from neural_enhanced_super_resolution_tpu.kernels import rdb_dform
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=1, num_grow_ch=32)
    params = fuse_rrdbnet_params(init_rrdbnet(jax.random.PRNGKey(0), cfg))
    rdb = {k: np.asarray(v[0]) for k, v in params["body"]["rdb1"].items()}
    wd = dform_rdb_weights(rdb)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (16, 288, 288, 64)), jnp.bfloat16)
    t = to_rows_s2d(x)
    a, w = t.shape[1], t.shape[2]
    xf = to_dform(t)
    print(f"# format shape {xf.shape}, grid nsteps={xf.shape[1]//8} "
          f"nwb={(xf.shape[2]-16)//rdb_dform.pick_wbw(w)}", flush=True)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(xf, wd, n):
        def body(i, h):
            return rdb_dform_call(h, wd, a, w, variant=variant)
        return lax.fori_loop(0, n, body, xf)

    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        rdb_dform_call)

    times = {}
    for n in (4, 16):
        tic = time.perf_counter()
        float(jnp.sum(chain(xf, wd, n).astype(jnp.float32)))
        compile_s = time.perf_counter() - tic
        best = float("inf")
        for _ in range(3):
            tic = time.perf_counter()
            float(jnp.sum(chain(xf, wd, n).astype(jnp.float32)))
            best = min(best, time.perf_counter() - tic)
        times[n] = best
        print(f"# {variant} n={n}: best={best*1e3:.1f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)
    per_rdb = (times[16] - times[4]) / 12
    steps = 16 * ((xf.shape[2] - 16) // rdb_dform.pick_wbw(w)) \
        * (xf.shape[1] // 8)
    print(f"{variant}: {per_rdb*1e3:.2f} ms/RDB  "
          f"{per_rdb/steps*1e6:.1f} us/step over {steps} steps  "
          f"(XLA trunk: 14.5 ms/RDB; v2 body probe: 20.3 us/step)",
          flush=True)


if __name__ == "__main__":
    main()
