#!/usr/bin/env python3
"""Serving-path A/B under a MEASURED tunnel state (VERDICT r4 #5).

Round 4 shipped the streamed final output (process_tiled_to_host) into a
session whose D2H tunnel was degrading 23 -> 11 MB/s, so its A/B read
NEUTRAL inside 2x noise. This harness makes the comparison reproducible
and self-qualifying:

1. D2H probe: fetch a freshly-computed 64 MB device array, whole
   (np.asarray) and chunk-parallel (runtime.device.device_fetch), 3 reps
   each, best-of. The probe rate stamps the session: the round-4 study
   classified >=20 MB/s as healthy, ~11 MB/s as degraded.
2. Streamed vs unstreamed A/B, INTERLEAVED pairs so tunnel drift hits
   both arms: full RRDBNet (12ch quirk, the bench.py flagship config) over
   a 2048^2 input at the production tile-256/halo-6 geometry ->
   201 MB uint8 output. Arm A = process_tiled (device stitch) +
   device_fetch; arm B = process_tiled_to_host (fetch overlapped with
   compute). Outputs are bit-identical by construction (pinned in
   tests/test_tiling.py); only wall-clock differs.

Prints ONE JSON line. Run ON TPU: python benchmarks/serving_story.py
"""

import json
import os
import sys
import time

os.environ.setdefault("NESR_COMPILE_CACHE_DIR",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "nesr-jax"))

import numpy as np


def _best(fn, reps=3):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def probe_d2h(reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.runtime.device import (
        device_fetch)

    # 64 MB uint8, recomputed per rep so no fetch is cache-warm.
    key = jax.random.PRNGKey(0)
    shape = (8192, 8192)  # 64 MB u8
    mb = shape[0] * shape[1] / (1 << 20)

    def make():
        x = (jax.random.uniform(key, shape) * 255).astype(jnp.uint8)
        return jax.block_until_ready(x)

    whole, chunked = [], []
    for _ in range(reps):
        x = make()
        t0 = time.perf_counter()
        np.asarray(x)
        whole.append(time.perf_counter() - t0)
        x = make()
        t0 = time.perf_counter()
        device_fetch(x, min_bytes=0)
        chunked.append(time.perf_counter() - t0)
    return {
        "d2h_whole_mb_per_s": round(mb / min(whole), 1),
        "d2h_chunked_mb_per_s": round(mb / min(chunked), 1),
        "d2h_whole_spread": round((max(whole) - min(whole)) / min(whole), 2),
    }


def ab_streamed(pairs: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)
    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        process_tiled, process_tiled_to_host)
    from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit
    from neural_enhanced_super_resolution_tpu.runtime.device import (
        device_fetch, enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    H = W = int(os.environ.get("NESR_SERVE_SIZE", 2048))
    TILE, HALO, BATCH = 256, 6, 16

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=23, num_grow_ch=32)
    params = jax.device_put(fuse_rrdbnet_params(
        init_rrdbnet(jax.random.PRNGKey(0), cfg)))
    image = np.random.default_rng(0).integers(0, 256, (H, W, 3),
                                              dtype=np.uint8)

    def model_fn(tiles):
        return _esrgan_jit(params, tiles, cfg, "bfloat16", "stack12")

    def unstreamed():
        out = process_tiled(model_fn, jnp.asarray(image), tile_size=TILE,
                            halo=HALO, scale=4, batch_tiles=BATCH)
        return device_fetch(out)

    def streamed():
        return process_tiled_to_host(model_fn, image, tile_size=TILE,
                                     halo=HALO, scale=4, batch_tiles=BATCH)

    unstreamed()  # compile + warm both programs
    streamed()
    t_un, t_st = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        unstreamed()
        t_un.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        streamed()
        t_st.append(time.perf_counter() - t0)
    out_mb = (H * 4) * (W * 4) * 3 / (1 << 20)
    return {
        "output_mb": round(out_mb, 0),
        "unstreamed_s": round(min(t_un), 2),
        "streamed_s": round(min(t_st), 2),
        "unstreamed_all": [round(t, 2) for t in t_un],
        "streamed_all": [round(t, 2) for t in t_st],
        "streamed_speedup": round(min(t_un) / min(t_st), 3),
    }


def main() -> int:
    res = {"metric": "serving_story"}
    res.update(probe_d2h())
    res["tunnel_state"] = ("healthy" if res["d2h_whole_mb_per_s"] >= 20
                           else "degraded")
    res.update(ab_streamed())
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
