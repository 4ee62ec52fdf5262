#!/usr/bin/env python3
"""SD-x4 cost vs latent size — the growth curve behind diffusion_max_megapixels.

The full pipeline's canvas grows 4x per iteration once the diffusion branch
joins the ensemble (reference _ensemble_results upscales every branch to the
max dims, nesr.py:1040-1052), so the diffusion branch's per-iteration cost is
a function of a geometrically growing input. The reference never states a
cap; its CUDA/MPS targets OOM out of the branch above ~512^2 inputs
(exception ladder, nesr.py:1028-1031). On TPU the flash-attention kernel
removes the OOM, so the skip must be an explicit config
(diffusion_max_megapixels, runtime/config.py). This envelope measures the
curve that justifies the default: per-step cost at a sweep of latent sizes
(latent = input resolution for the x4 upscaler), the per-call fixed cost
(CLIP + noising + VAE decode + dispatch), and the projected 20-step branch
cost.

One JSON line per size:
  {"latent": 160, "steps_per_s": ..., "fixed_s": ..., "vae_s": ...,
   "sec_20step": ...}

Env: NESR_SD_SIZES="96,128,160,224,256" (comma list), NESR_SD_GROWTH_PAIRS=2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_size(size: int, pairs: int, steps_hi: int, steps_lo: int) -> dict:
    import jax
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.models.diffusion import (
        CLIPTextConfig, DDIMScheduler, DDPMScheduler, UNetConfig, VAEConfig,
        UpscalePipeline)
    from neural_enhanced_super_resolution_tpu.models.diffusion.pipeline import (
        _sd_decode_jit)
    from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
        clip_param_shapes, random_params, unet_param_shapes, vae_param_shapes)

    ucfg = UNetConfig()
    vcfg = VAEConfig(block_out_channels=(128, 256, 512), layers_per_block=2)
    tcfg = CLIPTextConfig()
    key = jax.random.PRNGKey(0)
    pipe = UpscalePipeline(
        random_params(unet_param_shapes(ucfg), key), ucfg,
        random_params(vae_param_shapes(vcfg, decoder_only=True), key), vcfg,
        random_params(clip_param_shapes(tcfg), key), tcfg,
        DDIMScheduler(), DDPMScheduler(), tokenizer=None,
        compute_dtype="bfloat16")
    img = np.random.default_rng(0).integers(0, 256, (size, size, 3),
                                            dtype=np.uint8)

    def run(steps):
        out = pipe(prompt="a high resolution, detailed photograph",
                   image=img, noise_level=20, num_inference_steps=steps,
                   guidance_scale=7.5)
        return float(out.astype(np.float32).sum())

    t0 = time.perf_counter()
    run(steps_hi)  # compile
    compile_s = time.perf_counter() - t0
    run(steps_lo)
    t_hi, t_lo = [], []
    for _ in range(pairs):
        t0 = time.perf_counter(); run(steps_hi)
        t_hi.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(steps_lo)
        t_lo.append(time.perf_counter() - t0)
    slope = (min(t_hi) - min(t_lo)) / (steps_hi - steps_lo)
    fixed = min(t_lo) - steps_lo * slope
    line = {"latent": size, "input_mp": round(size * size / 1e6, 4),
            "compile_s": round(compile_s, 1)}
    if slope > 0:
        line.update(steps_per_s=round(1 / slope, 2),
                    fixed_s=round(fixed, 3),
                    sec_20step=round(fixed + 20 * slope, 2))
    # VAE decode at this latent (the dominant fixed cost candidate)
    lat = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (1, size, size, ucfg.out_channels)).astype(np.float32))
    _sd_decode_jit(pipe.vae_params, lat, vcfg, "bfloat16")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(_sd_decode_jit(pipe.vae_params, lat, vcfg,
                                  "bfloat16")).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    line["vae_s"] = round(best, 3)
    return line


def main() -> int:
    sizes = [int(s) for s in os.environ.get(
        "NESR_SD_SIZES", "96,128,160,224,256").split(",")]
    pairs = int(os.environ.get("NESR_SD_GROWTH_PAIRS", "2"))
    steps_hi = int(os.environ.get("NESR_SD_STEPS_HI", "12"))
    steps_lo = int(os.environ.get("NESR_SD_STEPS_LO", "4"))
    for size in sizes:
        try:
            print(json.dumps(bench_size(size, pairs, steps_hi, steps_lo)),
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(json.dumps({"latent": size, "error": str(exc)[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
