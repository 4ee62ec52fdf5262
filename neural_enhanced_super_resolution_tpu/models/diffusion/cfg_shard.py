"""Sharded split-CFG: the uncond/cond UNet passes on two mesh devices.

Round-4 measurement (benchmarks/envelope_unet_batch.py, RESULTS.md): the
classifier-free-guidance doubling is 0.39 of the UNet step and STRUCTURAL —
the batched [uncond, cond] pass is super-linear in batch (2.33x batch-1
even through the single-pass flash kernel), and single-chip split-CFG
already banks the cheaper schedule. The last lever is hardware: the two
passes are embarrassingly parallel, so on a >=2-chip mesh each pass runs on
its own device and only the tiny eps tensor crosses ICI once per step.

Formulation (TPU-native, shard_map over a ("cfg",)-axis mesh of size 2):
  * params / latents / conditioning image are REPLICATED (P()) — the loop
    carry must be identical on both devices;
  * the text embeddings and the hoisted context K/V get a leading pair axis
    [uncond, cond] sharded over "cfg" (P("cfg")) — device 0 computes the
    uncond eps, device 1 the cond eps, each a batch-n unet_forward exactly
    like single-device split-CFG (models/diffusion/pipeline.py cfg_split);
  * one all_gather("cfg") per step exchanges eps (n*h*w*4 floats — at the
    production 128^2 latent, 256 KB against a ~27 ms step), then both
    devices apply the guidance combination and the scheduler step
    redundantly, keeping the carry replicated without a broadcast.

Equality: per-sample math is identical to cfg_split=True on one device
(GroupNorm and attention never mix batch elements; the guidance arithmetic
is the same order), pinned by tests/test_diffusion.py::
test_cfg_sharded_matches_split to the same tolerance as
test_cfg_split_matches_batched. The perf claim needs real multi-chip
hardware (this environment has one TPU); the 8-virtual-device CPU mesh
proves compile + execute via __graft_entry__.dryrun_multichip step 5b.

Reference semantics anchored: guidance_scale=7.5 CFG at
/root/reference/nesr/nesr.py:1014-1016.

Flash-attention note: the Pallas kernel is a per-device program under
shard_map (not GSPMD-partitioned), so it works unchanged here — each
device runs the full batch-n kernel on its own pass. On CPU meshes the
flash gate falls back to the XLA einsum path as usual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
    DDPMScheduler)
from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
    UNetConfig, precompute_context_kv, unet_forward)

__all__ = ["cfg_mesh", "denoise_cfg_sharded"]


def cfg_mesh(devices=None) -> Mesh:
    """A ("cfg",)-axis mesh over exactly two devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()[:2]
    devices = list(devices)[:2]
    if len(devices) != 2:
        raise ValueError(f"split-CFG sharding needs 2 devices, got "
                         f"{len(devices)}")
    return Mesh(np.asarray(devices), ("cfg",))


@functools.lru_cache(maxsize=8)
def _denoise_fn(mesh: Mesh, unet_cfg: UNetConfig, scheduler,
                low_res_scheduler, compute_dtype: str):
    """Build + cache the jitted sharded denoise program for a mesh/config."""
    is_ddpm = isinstance(scheduler, DDPMScheduler)

    def sharded(params, latents, noisy_img, emb2, kv2, timesteps, nl,
                guidance_scale, step_noises):
        # Inside shard_map: emb2/kv2 carry the local pair slice (1, n, ...).
        emb_local = emb2[0]
        kv_local = {k: (a[0], b[0]) for k, (a, b) in kv2.items()}
        num_steps = timesteps.shape[0]

        def body(i, lat):
            t = timesteps[i]
            prev_t = jnp.where(i + 1 < num_steps, timesteps[i + 1], -1)
            unet_in = jnp.concatenate([lat, noisy_img], axis=-1)
            eps_local = unet_forward(params, unet_in, t, emb_local, nl,
                                     unet_cfg, compute_dtype,
                                     context_kv=kv_local)
            # (2, n, h, w, c): [0]=uncond (device 0), [1]=cond (device 1)
            both = lax.all_gather(eps_local, "cfg")
            eps = both[0] + guidance_scale * (both[1] - both[0])
            if is_ddpm:
                noise = jnp.where(t > 0, 1.0, 0.0) * step_noises[i]
                return scheduler.step(eps, t, prev_t, lat, noise)
            return scheduler.step(eps, t, prev_t, lat)

        return lax.fori_loop(0, num_steps, body, latents)

    # check_vma=False: the carry IS replicated in fact (the all_gather makes
    # eps identical on both devices, and the scheduler step is deterministic
    # from it), but the static varying-axes checker can't see through the
    # gather — it types everything downstream of the P("cfg") inputs as
    # cfg-varying and rejects the replicated carry/out_specs. Equality with
    # the single-device path is pinned by test_cfg_sharded_matches_split.
    mapped = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(), P(), P("cfg"), P("cfg"), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(mapped)


def denoise_cfg_sharded(unet_params, image, embeds, timesteps, noise_level,
                        guidance_scale, rng_key, unet_cfg: UNetConfig,
                        scheduler, low_res_scheduler, compute_dtype: str,
                        mesh: Mesh):
    """Noising + T-step denoise with the CFG pair sharded over ``mesh``.

    Same contract as pipeline._denoise_latents (image (n,h,w,3) in [-1,1],
    embeds (2n,77,D) [uncond, cond]); returns final latents (n,h,w,4) f32.
    Identical PRNG draws to the single-device paths (same key splits)."""
    n, h, w, _ = image.shape
    k_latent, k_img, k_loop = jax.random.split(rng_key, 3)

    img_noise = jax.random.normal(k_img, image.shape, jnp.float32)
    noisy_img = low_res_scheduler.add_noise(image, img_noise, noise_level)
    latents = jax.random.normal(k_latent, (n, h, w, unet_cfg.out_channels),
                                jnp.float32)
    nl = jnp.full((n,), noise_level, jnp.int32)

    num_steps = timesteps.shape[0]
    is_ddpm = isinstance(scheduler, DDPMScheduler)
    step_noises = (jax.random.normal(
        k_loop, (num_steps, n, h, w, unet_cfg.out_channels), jnp.float32)
        if is_ddpm else jnp.zeros((num_steps, 1, 1, 1, 1), jnp.float32))

    # Hoist the step-invariant context K/V once (on the default device),
    # then pair-shard: leading axis [uncond, cond] -> P("cfg").
    kv_all = precompute_context_kv(unet_params, embeds, unet_cfg,
                                   compute_dtype)
    kv2 = {k: (a.reshape(2, n, *a.shape[1:]), b.reshape(2, n, *b.shape[1:]))
           for k, (a, b) in kv_all.items()}
    emb2 = embeds.reshape(2, n, *embeds.shape[1:])

    fn = _denoise_fn(mesh, unet_cfg, scheduler, low_res_scheduler,
                     compute_dtype)
    return fn(unet_params, latents, noisy_img, emb2, kv2,
              jnp.asarray(timesteps, jnp.int32), nl,
              jnp.float32(guidance_scale), step_noises)
