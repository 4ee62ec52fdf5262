#!/usr/bin/env python3
"""Diffusion UNet step envelope: where do the 73 ms per denoise step go?

Slope-times the full-size x4-upscaler UNet forward (CFG batch 2, 128^2
latents, synthetic weights) and A/Bs the attention dispatch:

  flash — default: Pallas flash kernel for seq >= 1024 self-attention
  xla   — NESR_DISABLE_FLASH_ATTENTION=1: einsum attention everywhere

Analytic model FLOPs ~2.7 TFLOP per CFG step; at the tracked 13.64
steps/s that is ~36 TF/s (~19% MFU) — this probe checks whether the
attention path is the gap.

Run ON TPU:  python benchmarks/envelope_unet.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neural_enhanced_super_resolution_tpu.models.diffusion import (
        UNetConfig)
    from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
        random_params, unet_param_shapes)
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        unet_forward)

    ucfg = UNetConfig()
    params = random_params(unet_param_shapes(ucfg), jax.random.PRNGKey(0))
    params = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 7)), jnp.float32)
    ctx = jnp.asarray(rng.normal(0, 1, (2, 77, 1024)), jnp.float32)
    nl = jnp.int32([20, 20])

    @functools.partial(jax.jit, static_argnames=("n",))
    def reps(x, ctx, n):
        def body(i, h):
            out = unet_forward(params, h[..., :7], jnp.int32(100 + i), ctx,
                               nl, ucfg, "bfloat16")
            # feed back to serialize iterations (prevents DCE/overlap)
            return h.at[..., :4].add(0.001 * out)
        return lax.fori_loop(0, n, body, x)

    flops = 2.68e12  # analytic, see docstring

    for label in ("flash", "xla"):
        os.environ["NESR_DISABLE_FLASH_ATTENTION"] = \
            "0" if label == "flash" else "1"
        times = {}
        for n in (2, 6):
            tic = time.perf_counter()
            float(jnp.sum(reps(x, ctx, n).astype(jnp.float32)))
            compile_s = time.perf_counter() - tic
            best = float("inf")
            for _ in range(3):
                tic = time.perf_counter()
                float(jnp.sum(reps(x, ctx, n).astype(jnp.float32)))
                best = min(best, time.perf_counter() - tic)
            times[n] = best
            print(f"# {label} n={n}: {best*1e3:.1f} ms "
                  f"(compile {compile_s:.0f}s)", flush=True)
        per_fwd = (times[6] - times[2]) / 4
        print(f"{label}: {per_fwd*1e3:.1f} ms per CFG-batch UNet fwd = "
              f"{flops/per_fwd/1e12:.1f} TF/s "
              f"({flops/per_fwd/197e12*100:.0f}% MFU)", flush=True)
        # the env var is read at trace time; drop the cache between labels
        reps._clear_cache() if hasattr(reps, "_clear_cache") else None
        jax.clear_caches()


if __name__ == "__main__":
    main()
