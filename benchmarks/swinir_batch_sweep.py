#!/usr/bin/env python3
"""SwinIR-M x4 throughput vs batch on one v5e (production forward).

The pipeline runs the SwinIR quality branch at tile 192 / batch 4
(pipeline tiling defaults).  The forward is HBM-glue-bound (see
RESULTS.md round-3 SwinIR cost structure), so batching is the one lever
that amortises the per-block elementwise passes over more useful pixels
without touching the model.  This sweep measures the real
`swinir_forward` (random weights — perf only) at batch 1..16.

Run ON TPU: python benchmarks/swinir_batch_sweep.py [H] [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NESR_COMPILE_CACHE_DIR",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "nesr-jax"))

import numpy as np
import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.swinir import (
    SwinIRConfig, init_swinir, swinir_forward)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    batches = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8, 16]
    cfg = SwinIRConfig(scale=4, embed_dim=180, depths=(6,) * 6,
                       num_heads=(6,) * 6, window_size=8, mlp_ratio=2.0,
                       upsampler="pixelshuffle")
    params = init_swinir(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    for b in batches:
        x = jnp.asarray(rng.random((b, h, h, 3), np.float32))
        t0 = time.time()
        float(jnp.sum(swinir_forward(params, x, cfg)))
        print(f"b={b:2d} compile+first {time.time() - t0:6.1f} s", flush=True)
        best = 1e9
        for _ in range(6):
            t0 = time.time()
            float(jnp.sum(swinir_forward(params, x, cfg)))
            best = min(best, time.time() - t0)
        mp = b * h * h * cfg.scale * cfg.scale / 1e6
        print(f"b={b:2d} best-of-6 {best * 1e3:8.1f} ms  "
              f"{mp / best:6.2f} MP_out/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
