"""Stage-level timing breakdown of the flagship ESRGAN tile batch.

Times, on the real chip, each piece of the per-batch program that bench.py
runs (tile 256 + halo 16 -> (16,288,288,3) uint8 batches over a 2048^2 image):

  * 12-channel input build + conv_first
  * the 23-block RRDB trunk (lax.scan over fused RDBs)
  * the folded upsampling head
  * full _esrgan_jit per-batch program
  * end-to-end process_tiled (adds extract/stitch + 4 batch dispatches)

All timings use the scalar-fetch method (sum -> float) because
block_until_ready is unreliable over remote-device tunnels (RESULTS.md).
"""

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
from jax import lax

from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
    RRDBNetConfig, _conv3x3, _head_forward, _rrdb, fuse_rrdbnet_params,
    init_rrdbnet)
from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit
from neural_enhanced_super_resolution_tpu.runtime.device import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

B, T = 16, 288


def timed(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args).astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best * 1e3:8.2f} ms   (compile {compile_s:5.1f}s)")
    return best


def main():
    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=23, num_grow_ch=32)
    params = jax.device_put(fuse_rrdbnet_params(
        init_rrdbnet(jax.random.PRNGKey(0), cfg)))
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(0, 256, (B, T, T, 3), dtype=np.uint8))
    feat = jnp.asarray(rng.normal(0, 0.5, (B, T, T, 64)).astype(np.float32),
                       jnp.bfloat16)

    @jax.jit
    def trunk(params, feat):
        def step(h, bp):
            return _rrdb(h, bp, jnp.bfloat16), None
        out, _ = lax.scan(step, feat, params["body"])
        return out

    @jax.jit
    def head(params, feat):
        return _head_forward(feat, params, jnp.bfloat16)

    @jax.jit
    def full(params, tiles):
        return _esrgan_jit(params, tiles, cfg, "bfloat16", "stack12")

    t_trunk = timed("trunk (23 RRDB scan)", trunk, params, feat)
    t_head = timed("head (folded upsample)", head, params, feat)
    t_full = timed("full _esrgan_jit batch", full, params, tiles)
    print(f"{'other (input/conv_first/resid)':34s} "
          f"{(t_full - t_trunk - t_head) * 1e3:8.2f} ms")

    # Per-RDB cost and effective TF/s for context
    px = B * T * T
    rdb_flops = px * 479_000  # exact fused-RDB FLOPs per pixel (RESULTS.md)
    total_trunk = rdb_flops * 69 / 1e12
    print(f"trunk effective: {total_trunk / t_trunk:6.1f} TF/s "
          f"({total_trunk:.1f} TFLOP over 69 RDBs, "
          f"{t_trunk / 69 * 1e3:.2f} ms/RDB)")


if __name__ == "__main__":
    main()
