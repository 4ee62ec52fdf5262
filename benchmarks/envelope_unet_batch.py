#!/usr/bin/env python3
"""Is the CFG batch-2 UNet step super-linear vs batch-1? (round-4 SD
step decomposition follow-up.)

The NESR_SD_ABLATE=cfg slope showed a batch-1 denoise step at ~38% of the
batch-2 cost (19.29 -> 50.77 steps/s), i.e. two batch-1 UNet passes would
beat one batch-2 CFG pass by ~25%. This envelope isolates the UNet: a
jitted fori_loop of `steps` chained forwards (latents fed back so nothing
is loop-invariant), slope-timed 16-vs-4 so per-call dispatch noise
cancels, at batch 1, batch 2, and batch-1-twice-per-step (the split-CFG
candidate schedule).

Run ON TPU: python benchmarks/envelope_unet_batch.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
    random_params, unet_param_shapes)
from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
    UNetConfig, unet_forward)

SIZE = int(os.environ.get("NESR_UNET_ENV_SIZE", "128"))
HI, LO = 16, 4


@functools.partial(jax.jit,
                   static_argnames=("batch", "steps", "split", "ucfg"))
def loop(params, lat, img, emb, batch, steps, split, ucfg):
    nl = jnp.full((batch,), 20, jnp.int32)

    def fwd(latents, e, n):
        x = jnp.concatenate([latents, img[: latents.shape[0]]], axis=-1)
        return unet_forward(params, x, jnp.int32(10), e, n, ucfg,
                            "bfloat16")

    def body(i, latents):
        if split:
            # split-CFG schedule: two batch-1 passes per step
            eps_u = fwd(latents, emb[:1], nl[:1])
            eps_c = fwd(latents, emb[1:2], nl[:1])
            eps = eps_u + 7.5 * (eps_c - eps_u)
        else:
            eps = fwd(latents, emb, nl)
            if batch == 2:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + 7.5 * (eps_c - eps_u)
        # feed back so successive forwards are data-dependent (no LICM)
        return latents - 0.05 * eps[: latents.shape[0]]

    return lax.fori_loop(0, steps, body, lat)


def time_config(params, ucfg, batch, split):
    key = jax.random.PRNGKey(0)
    n = 1 if split else batch
    lat = jax.random.normal(key, (n, SIZE, SIZE, ucfg.out_channels),
                            jnp.float32)
    img = jax.random.normal(key, (batch, SIZE, SIZE, 3), jnp.float32)
    emb = jax.random.normal(key, (batch, 77, 1024), jnp.float32)

    def run(steps):
        out = loop(params, lat, img, emb, batch, steps, split, ucfg)
        return float(jnp.sum(out.astype(jnp.float32)))

    run(HI)
    run(LO)
    slopes = []
    for _ in range(4):
        t0 = time.perf_counter()
        run(HI)
        thi = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(LO)
        tlo = time.perf_counter() - t0
        if thi > tlo:
            slopes.append((thi - tlo) / (HI - LO))
    best = min(slopes) if slopes else float("nan")
    return best, slopes


def main():
    ucfg = UNetConfig()
    params = random_params(unet_param_shapes(ucfg), jax.random.PRNGKey(0))
    params = jax.device_put(params)
    for label, batch, split in (("batch1", 1, False), ("batch2_cfg", 2, False),
                                ("split_cfg_2x1", 2, True)):
        per_step, slopes = time_config(params, ucfg, batch, split)
        print(f"{label:14s} per-step {per_step*1e3:7.2f} ms   "
              f"slopes {[round(s*1e3, 2) for s in slopes]}", flush=True)


if __name__ == "__main__":
    main()
