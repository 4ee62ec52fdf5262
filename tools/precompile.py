#!/usr/bin/env python3
"""Warm the persistent compilation cache for production shapes.

Cold-start cost in this framework is compile time: the first enhancement on
a fresh machine compiles the tile-batch ESRGAN program (and optionally the
diffusion denoise loop) — seconds to minutes depending on hardware. This
tool compiles the standard shape buckets ahead of time into the persistent
JAX compilation cache (NESR_COMPILE_CACHE_DIR, default ~/.cache/nesr-jax),
so serving processes start hot. Run it once per machine/image build:

    python tools/precompile.py                 # ESRGAN tile program
    python tools/precompile.py --diffusion     # + 128x128-latent denoise

Shapes warmed (matching runtime/config.py + parallel/tiling defaults):
  * (16, T+2h, T+2h, 3) uint8 tile batches for tile sizes 256/512 with the
    configured halo, 12ch quirk mode, bf16 — the pipeline's hot program.
  * the untiled raw-scale buckets used below the tiling threshold.

Uses synthetic weights: compilation caches key on shapes/HLO, not values,
so warmed executables are reused with real checkpoints.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NESR_COMPILE_CACHE_DIR",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "nesr-jax"))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--diffusion", action="store_true",
                    help="also warm the SD x4 denoise loop (slow compile)")
    ap.add_argument("--image-size", type=int, default=128,
                    help="input HxW for the diffusion warm (the latent grid "
                         "matches the input for the x4 upscaler)")
    ap.add_argument("--staged", action="store_true",
                    help="warm the STAGED diffusion programs (separate "
                         "clip/denoise/vae jits — what runs under a "
                         "StageTimer or a cfg-shard mesh) instead of the "
                         "fused single program")
    ap.add_argument("--tile-sizes", type=int, nargs="*", default=[256])
    # default matches the TPU production overlay (runtime/config.py round 4)
    ap.add_argument("--halo", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)
    from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit
    from neural_enhanced_super_resolution_tpu.runtime.device import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    rng = np.random.default_rng(0)

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=23, num_grow_ch=32)
    params = jax.device_put(fuse_rrdbnet_params(
        init_rrdbnet(jax.random.PRNGKey(0), cfg)))

    # tile_tail="full" (TPU default, round 4) means production only ever
    # runs the FULL-batch program; the tail buckets are only needed for
    # configs that opt back into "bucket" mode.
    buckets = [args.batch]
    if os.environ.get("NESR_PRECOMPILE_BUCKETS") == "1":
        buckets += [max(1, args.batch // 2), max(1, args.batch // 4)]
    from neural_enhanced_super_resolution_tpu.pipeline import _sharpen_batch
    for tile in args.tile_sizes:
        side = tile + 2 * args.halo
        for b in buckets:
            tiles = jnp.asarray(rng.integers(
                0, 256, (b, side, side, 3), dtype=np.uint8))
            t0 = time.perf_counter()
            out = _esrgan_jit(params, tiles, cfg, "bfloat16", "stack12")
            float(jnp.sum(out.astype(jnp.float32)))
            print(f"warmed esrgan tile={tile} halo={args.halo} "
                  f"batch={b}: {time.perf_counter() - t0:.1f}s")
        # the streamed final iteration's fused batch sharpen (pipeline
        # _streamed_esrgan_final) runs on the x4 output tiles
        t0 = time.perf_counter()
        out4 = _sharpen_batch(jnp.asarray(rng.integers(
            0, 256, (args.batch, 4 * side, 4 * side, 3), dtype=np.uint8)))
        float(jnp.sum(out4.astype(jnp.float32)))
        print(f"warmed streamed sharpen tile={tile}: "
              f"{time.perf_counter() - t0:.1f}s")

    if args.diffusion:
        from neural_enhanced_super_resolution_tpu.models.diffusion import (
            CLIPTextConfig, DDIMScheduler, DDPMScheduler, UNetConfig,
            VAEConfig)
        from neural_enhanced_super_resolution_tpu.models.diffusion.pipeline \
            import UpscalePipeline
        from neural_enhanced_super_resolution_tpu.models.diffusion.specs \
            import (clip_param_shapes, random_params, unet_param_shapes,
                    vae_param_shapes)
        ucfg, vcfg, tcfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
        key = jax.random.PRNGKey(0)
        pipe = UpscalePipeline(
            random_params(unet_param_shapes(ucfg), key, scale=0.02), ucfg,
            random_params(vae_param_shapes(vcfg, decoder_only=False), key,
                          scale=0.02), vcfg,
            random_params(clip_param_shapes(tcfg), key, scale=0.02), tcfg,
            DDIMScheduler(), DDPMScheduler())
        if args.staged:
            # attach a timer so __call__ takes the staged path and warms
            # the separate clip/denoise/vae executables (the programs a
            # sd_stage_detail serving config actually runs)
            from neural_enhanced_super_resolution_tpu.runtime.profiler \
                import StageTimer
            pipe.timer = StageTimer()
        s = args.image_size
        img = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        pipe("a photo", img, num_inference_steps=20)
        label = "staged" if args.staged else "fused"
        print(f"warmed sd_x4 {label} pipeline at {s}x{s}: "
              f"{time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
