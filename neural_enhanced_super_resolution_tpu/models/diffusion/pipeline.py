"""StableDiffusionUpscalePipeline equivalent — jit-compiled denoise loop.

Call contract mirrors what the reference invokes
(/root/reference/nesr/nesr.py:999-1025): ``pipe(prompt=..., image=...,
noise_level=20, num_inference_steps=10/20, guidance_scale=7.5)`` returning an
RGB uint8 array at 4x resolution.

TPU-native structure:
  * text encoding, image noising, the full T-step denoise loop
    (lax.fori_loop) and the VAE decode compile into jitted programs;
    latents never leave HBM between steps (SURVEY.md §2b);
  * classifier-free guidance batches cond/uncond on the UNet batch axis
    (one forward per step, batch=2);
  * bf16 compute with f32 accumulation throughout.
"""

from __future__ import annotations

import functools
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.models.diffusion.clip_text import (
    CLIPTextConfig, clip_text_forward)
from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
    load_component, read_json)
from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
    DDIMScheduler, DDPMScheduler)
from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
    UNetConfig, unet_forward)
from neural_enhanced_super_resolution_tpu.models.diffusion.vae import (
    VAEConfig, vae_decode)

logger = logging.getLogger("nesr.diffusion")

__all__ = ["UpscalePipeline", "load_upscale_pipeline"]


class UpscalePipeline:
    """x4 latent upscaler: CLIP text + UNet + DDIM/DDPM + VAE decoder."""

    def __init__(self, unet_params, unet_cfg: UNetConfig, vae_params,
                 vae_cfg: VAEConfig, text_params, text_cfg: CLIPTextConfig,
                 scheduler, low_res_scheduler, tokenizer=None,
                 compute_dtype: str = "bfloat16",
                 max_noise_level: int = 350,
                 cfg_split: bool | None = None):
        # cfg_split: run the classifier-free-guidance step as TWO batch-n
        # UNet passes (uncond, cond) instead of one batch-2n pass. Measured
        # on v5e at the production 128^2 latent the batched step is
        # SUPER-linear in batch (45.5 ms vs 19.7 ms for batch 1 —
        # benchmarks/envelope_unet_batch.py), so the split schedule is
        # ~16% faster per step with identical per-sample math (GroupNorm
        # and attention never mix batch elements). Default on; override
        # with the arg or NESR_SD_CFG_SPLIT=0.
        if cfg_split is None:
            cfg_split = os.environ.get("NESR_SD_CFG_SPLIT", "1") == "1"
        self.cfg_split = bool(cfg_split)
        self.unet_params = unet_params
        self.unet_cfg = unet_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.text_params = text_params
        self.text_cfg = text_cfg
        self.scheduler = scheduler
        self.low_res_scheduler = low_res_scheduler
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype
        self.max_noise_level = max_noise_level
        self.device = None  # None = default placement
        # Optional StageTimer (runtime/profiler.py). When set, __call__ runs
        # the SPLIT formulation — three jitted programs (CLIP encode /
        # denoise loop / VAE decode) timed as diffusion/clip, diffusion/
        # denoise, diffusion/vae — instead of the fused single program.
        # Same helpers build both programs (_denoise_latents/_decode_latents)
        # so the outputs are identical (tests/test_diffusion.py::
        # test_split_stage_path_matches_fused); the split costs one extra
        # HBM materialisation of the latents plus two dispatches, which is
        # noise next to the loop. The orchestrator enables it for the
        # five-config harness's per-stage table (VERDICT round 4 #1).
        self.timer = None
        # Optional ("cfg",)-axis 2-device mesh (cfg_shard.cfg_mesh): the
        # uncond/cond UNet passes run on disjoint chips, one eps all_gather
        # per step (models/diffusion/cfg_shard.py). Set via the pipeline
        # config key sd_cfg_shard; equality pinned by
        # test_cfg_sharded_matches_split.
        self.cfg_shard_mesh = None

    def to_device(self, device) -> "UpscalePipeline":
        """Pin all params to one device (stage-overlap placement).

        The orchestrator splits the device list so the ESRGAN tile batch and
        this denoise loop run on disjoint chips concurrently
        (parallel/overlap.split_mesh; pipeline._parallel_layout). Committing
        the params here makes every jitted program in __call__ execute on
        ``device``; uncommitted inputs follow the committed operands.
        """
        put = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.device_put(a, device), t)
        self.unet_params = put(self.unet_params)
        self.vae_params = put(self.vae_params)
        self.text_params = put(self.text_params)
        self.device = device
        return self

    # ------------------------------------------------------------- text ----

    def _tokenize(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            ids = self.tokenizer(
                text, padding="max_length",
                max_length=self.text_cfg.max_position_embeddings,
                truncation=True, return_tensors="np").input_ids
            return ids.astype(np.int32)
        # TEST-FIXTURE-ONLY fallback (snapshot without tokenizer files):
        # stable crc32 word hashing (builtin hash() is salted per process),
        # bos/eos framed like CLIP. Real prompts require the snapshot's
        # vocab.json/merges.txt, which the native BPE above consumes.
        import zlib
        words = text.lower().split()
        bos, eos = 49406, 49407
        ids = [bos] + [zlib.crc32(w.encode()) % 49000
                       for w in words][:75] + [eos]
        ids += [eos] * (self.text_cfg.max_position_embeddings - len(ids))
        return np.asarray([ids], dtype=np.int32)

    def encode_prompt(self, prompt: str) -> jax.Array:
        """CFG-stacked [uncond, cond] embeddings, (2, 77, hidden)."""
        cond = self._tokenize(prompt)
        uncond = self._tokenize("")
        ids = jnp.asarray(np.concatenate([uncond, cond], axis=0))
        return clip_text_forward(self.text_params, ids, self.text_cfg,
                                 self.compute_dtype)

    # ------------------------------------------------------------ trace ----

    def trace_latents(self, prompt: str, image: np.ndarray,
                      image_noise: np.ndarray, init_latents: np.ndarray,
                      noise_level: int = 20, num_inference_steps: int = 20,
                      guidance_scale: float = 7.5
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Deterministic replay for the reference-parity harness
        (tools/compare_reference.py --stack diffusion): every noise draw is
        INJECTED instead of PRNG-generated, so the per-step latents are
        directly comparable against a recording of the reference stack
        (diffusers StableDiffusionUpscalePipeline components,
        /root/reference/nesr/nesr.py:999-1025 call params).

        image: RGB uint8 (H, W, 3); image_noise: (H, W, 3) f32 standard
        normal added to the conditioning image at ``noise_level``;
        init_latents: (H, W, 4) f32 standard normal. DDIM (eta=0) has no
        per-step noise, so these two tensors fully determine the trajectory.

        Returns (latents_per_step (T, H, W, 4) f32, final RGB uint8).
        """
        embeds = self.encode_prompt(prompt)
        img = jnp.asarray(image).astype(jnp.float32) / 127.5 - 1.0
        timesteps = jnp.asarray(
            self.scheduler.timesteps(num_inference_steps), jnp.int32)
        lats, out = _upscale_trace_jit(
            self.unet_params, self.vae_params, img[None], embeds, timesteps,
            jnp.int32(noise_level), jnp.float32(guidance_scale),
            jnp.asarray(image_noise, jnp.float32)[None],
            jnp.asarray(init_latents, jnp.float32)[None],
            self.unet_cfg, self.vae_cfg, self.scheduler,
            self.low_res_scheduler, self.compute_dtype)
        return np.asarray(lats[:, 0]), np.asarray(out[0])

    # ------------------------------------------------------------- call ----

    def __call__(self, prompt: str, image: np.ndarray, noise_level: int = 20,
                 num_inference_steps: int = 20, guidance_scale: float = 7.5,
                 seed: int = 0) -> np.ndarray:
        """image: RGB uint8 (H, W, 3); returns RGB uint8 (4H, 4W, 3)."""
        if noise_level > self.max_noise_level:
            raise ValueError(f"noise_level {noise_level} > max "
                             f"{self.max_noise_level}")
        if self.timer is not None or self.cfg_shard_mesh is not None:
            return self._call_staged(prompt, image, noise_level,
                                     num_inference_steps, guidance_scale,
                                     seed)
        embeds = self.encode_prompt(prompt)
        img = jnp.asarray(image).astype(jnp.float32) / 127.5 - 1.0
        timesteps = jnp.asarray(
            self.scheduler.timesteps(num_inference_steps), jnp.int32)
        out = _upscale_jit(
            self.unet_params, self.vae_params, img[None], embeds, timesteps,
            jnp.int32(noise_level), jnp.float32(guidance_scale),
            jax.random.PRNGKey(seed), self.unet_cfg, self.vae_cfg,
            self.scheduler, self.low_res_scheduler, self.compute_dtype,
            self.cfg_split)
        return np.asarray(out[0])

    def _call_staged(self, prompt, image, noise_level, num_inference_steps,
                     guidance_scale, seed) -> np.ndarray:
        """__call__ split into separate programs — used when a StageTimer is
        attached (timed sub-stages) and/or when a cfg-shard mesh is set (the
        denoise loop runs shard_map'd; the VAE decode stays single-device).
        Identical math to the fused program: same body helpers, same PRNG
        key; only the jit boundaries differ."""
        import contextlib

        stage = (self.timer.stage if self.timer is not None
                 else lambda name: contextlib.nullcontext())
        with stage("diffusion/clip"):
            embeds = jax.block_until_ready(self.encode_prompt(prompt))
        img = jnp.asarray(image).astype(jnp.float32) / 127.5 - 1.0
        timesteps = jnp.asarray(
            self.scheduler.timesteps(num_inference_steps), jnp.int32)
        with stage("diffusion/denoise"):
            if self.cfg_shard_mesh is not None:
                from neural_enhanced_super_resolution_tpu.models.diffusion \
                    .cfg_shard import denoise_cfg_sharded
                latents = jax.block_until_ready(denoise_cfg_sharded(
                    self.unet_params, img[None], embeds, timesteps,
                    jnp.int32(noise_level), jnp.float32(guidance_scale),
                    jax.random.PRNGKey(seed), self.unet_cfg, self.scheduler,
                    self.low_res_scheduler, self.compute_dtype,
                    self.cfg_shard_mesh))
            else:
                latents = jax.block_until_ready(_sd_denoise_jit(
                    self.unet_params, img[None], embeds, timesteps,
                    jnp.int32(noise_level), jnp.float32(guidance_scale),
                    jax.random.PRNGKey(seed), self.unet_cfg, self.scheduler,
                    self.low_res_scheduler, self.compute_dtype,
                    self.cfg_split))
        with stage("diffusion/vae"):
            out = jax.block_until_ready(_sd_decode_jit(
                self.vae_params, latents, self.vae_cfg, self.compute_dtype))
        return np.asarray(out[0])


def _denoise_latents(unet_params, image, embeds, timesteps, noise_level,
                     guidance_scale, rng_key, unet_cfg: UNetConfig,
                     scheduler, low_res_scheduler, compute_dtype: str,
                     cfg_split: bool):
    """Noising + the full T-step denoise loop -> final latents (f32).

    Shared by the fused program (_upscale_jit) and the staged-timing
    program (_sd_denoise_jit) so the two paths are the same ops."""
    n, h, w, _ = image.shape
    k_latent, k_img, k_loop = jax.random.split(rng_key, 3)

    # Noise the conditioning image to `noise_level` (low-res DDPM schedule).
    img_noise = jax.random.normal(k_img, image.shape, jnp.float32)
    noisy_img = low_res_scheduler.add_noise(image, img_noise, noise_level)

    # Init latents at the *input* resolution (f=4 VAE decodes to 4x).
    latents = jax.random.normal(k_latent, (n, h, w, unet_cfg.out_channels),
                                jnp.float32)

    # CFG batch: [uncond, cond] on the batch axis; image + noise level too.
    img2 = jnp.concatenate([noisy_img, noisy_img], axis=0)
    nl2 = jnp.full((2 * n,), noise_level, jnp.int32)

    num_steps = timesteps.shape[0]
    is_ddpm = isinstance(scheduler, DDPMScheduler)
    step_noises = (jax.random.normal(
        k_loop, (num_steps, n, h, w, unet_cfg.out_channels), jnp.float32)
        if is_ddpm else None)

    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        SD_ABLATE)
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        precompute_context_kv)

    # Hoist the text-context K/V projections out of the step loop: they are
    # step-invariant, but left inside the fori_loop body XLA re-executes
    # them every step as ~64 skinny (77, ctx_dim) matmuls costing ~14 ms of
    # a 29 ms step (ablation split, RESULTS.md round-4 cross-attention
    # record). Computed once here they become loop-constant captures.
    kv_all = precompute_context_kv(unet_params, embeds, unet_cfg,
                                   compute_dtype)
    kv_uncond = {k: (a[:n], b[:n]) for k, (a, b) in kv_all.items()}
    kv_cond = {k: (a[n:], b[n:]) for k, (a, b) in kv_all.items()}

    def body(i, latents):
        t = timesteps[i]
        prev_t = jnp.where(i + 1 < num_steps, timesteps[i + 1], -1)
        if "cfg" in SD_ABLATE:
            # profiling ablation: conditional-only single batch (no
            # classifier-free-guidance doubling)
            unet_in = jnp.concatenate([latents, noisy_img], axis=-1)
            eps = unet_forward(unet_params, unet_in, t, embeds[1:],
                               nl2[:n], unet_cfg, compute_dtype,
                               context_kv=kv_cond)
        elif cfg_split:
            # split-CFG schedule: two batch-n passes instead of one
            # batch-2n pass (measured super-linear batch cost — see
            # UpscalePipeline.__init__ / envelope_unet_batch.py). Same
            # per-sample math as the batched branch below.
            unet_in = jnp.concatenate([latents, noisy_img], axis=-1)
            eps_uncond = unet_forward(unet_params, unet_in, t, embeds[:n],
                                      nl2[:n], unet_cfg, compute_dtype,
                                      context_kv=kv_uncond)
            eps_cond = unet_forward(unet_params, unet_in, t, embeds[n:],
                                    nl2[:n], unet_cfg, compute_dtype,
                                    context_kv=kv_cond)
            eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        else:
            lat2 = jnp.concatenate([latents, latents], axis=0)
            unet_in = jnp.concatenate([lat2, img2], axis=-1)
            eps = unet_forward(unet_params, unet_in, t, embeds, nl2,
                               unet_cfg, compute_dtype, context_kv=kv_all)
            eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
            eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        if is_ddpm:
            noise = jnp.where(t > 0, 1.0, 0.0) * step_noises[i]
            return scheduler.step(eps, t, prev_t, latents, noise)
        return scheduler.step(eps, t, prev_t, latents)

    return lax.fori_loop(0, num_steps, body, latents)


def _decode_latents(vae_params, latents, vae_cfg: VAEConfig,
                    compute_dtype: str):
    """Final latents (f32) -> RGB uint8 (shared VAE-decode tail)."""
    decoded = vae_decode(vae_params, latents / vae_cfg.scaling_factor,
                         vae_cfg, compute_dtype)
    out = jnp.clip((decoded + 1.0) * 127.5, 0.0, 255.0)
    return jnp.round(out).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "scheduler", "low_res_scheduler",
                     "compute_dtype", "cfg_split"))
def _upscale_jit(unet_params, vae_params, image, embeds, timesteps,
                 noise_level, guidance_scale, rng_key, unet_cfg: UNetConfig,
                 vae_cfg: VAEConfig, scheduler, low_res_scheduler,
                 compute_dtype: str, cfg_split: bool = False):
    latents = _denoise_latents(unet_params, image, embeds, timesteps,
                               noise_level, guidance_scale, rng_key, unet_cfg,
                               scheduler, low_res_scheduler, compute_dtype,
                               cfg_split)
    return _decode_latents(vae_params, latents, vae_cfg, compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "scheduler", "low_res_scheduler",
                     "compute_dtype", "cfg_split"))
def _sd_denoise_jit(unet_params, image, embeds, timesteps, noise_level,
                    guidance_scale, rng_key, unet_cfg: UNetConfig, scheduler,
                    low_res_scheduler, compute_dtype: str, cfg_split: bool):
    return _denoise_latents(unet_params, image, embeds, timesteps,
                            noise_level, guidance_scale, rng_key, unet_cfg,
                            scheduler, low_res_scheduler, compute_dtype,
                            cfg_split)


@functools.partial(jax.jit, static_argnames=("vae_cfg", "compute_dtype"))
def _sd_decode_jit(vae_params, latents, vae_cfg: VAEConfig,
                   compute_dtype: str):
    return _decode_latents(vae_params, latents, vae_cfg, compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "scheduler", "low_res_scheduler",
                     "compute_dtype"))
def _upscale_trace_jit(unet_params, vae_params, image, embeds, timesteps,
                       noise_level, guidance_scale, image_noise, init_latents,
                       unet_cfg: UNetConfig, vae_cfg: VAEConfig, scheduler,
                       low_res_scheduler, compute_dtype: str):
    """_upscale_jit with injected noise and per-step latent collection
    (lax.scan instead of fori_loop). DDIM-only: the parity harness records
    the published checkpoint's DDIM trajectory, which is noise-free past the
    two injected tensors."""
    n = image.shape[0]
    noisy_img = low_res_scheduler.add_noise(image, image_noise, noise_level)
    img2 = jnp.concatenate([noisy_img, noisy_img], axis=0)
    nl2 = jnp.full((2 * n,), noise_level, jnp.int32)
    num_steps = timesteps.shape[0]

    def step(latents, i):
        t = timesteps[i]
        prev_t = jnp.where(i + 1 < num_steps, timesteps[i + 1], -1)
        lat2 = jnp.concatenate([latents, latents], axis=0)
        unet_in = jnp.concatenate([lat2, img2], axis=-1)
        eps = unet_forward(unet_params, unet_in, t, embeds, nl2, unet_cfg,
                           compute_dtype)
        eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        latents = scheduler.step(eps, t, prev_t, latents)
        return latents, latents

    latents, lats = lax.scan(step, init_latents, jnp.arange(num_steps))
    decoded = vae_decode(vae_params, latents / vae_cfg.scaling_factor,
                         vae_cfg, compute_dtype)
    out = jnp.clip((decoded + 1.0) * 127.5, 0.0, 255.0)
    return lats, jnp.round(out).astype(jnp.uint8)


def load_upscale_pipeline(path: str | None = None,
                          compute_dtype: str = "bfloat16",
                          cfg_split: bool | None = None) -> UpscalePipeline:
    """Load a diffusers-layout snapshot of the x4 upscaler.

    ``path`` defaults to the downloader's HF directory for
    stabilityai/stable-diffusion-x4-upscaler
    (utils/downloader.py registry, mirroring the reference's
    nesr/utils/downloader.py:37-42).
    """
    if path is None:
        from neural_enhanced_super_resolution_tpu.utils.downloader import (
            get_model_path)
        path = get_model_path("sd_upscaler")
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"diffusion model snapshot not found at {path}")

    unet_config, unet_params = load_component(os.path.join(path, "unet"))
    vae_config, vae_params = load_component(os.path.join(path, "vae"))
    text_config, text_params = load_component(
        os.path.join(path, "text_encoder"))

    sched_cfg = read_json(os.path.join(path, "scheduler",
                                       "scheduler_config.json"))
    low_cfg = read_json(os.path.join(path, "low_res_scheduler",
                                     "scheduler_config.json"))
    sched_cls = (DDIMScheduler if "DDIM" in sched_cfg.get("_class_name", "")
                 else DDPMScheduler)
    scheduler = sched_cls(**sched_cfg)
    low_res_scheduler = DDPMScheduler(**low_cfg)

    tokenizer = None
    tok_dir = os.path.join(path, "tokenizer")
    if os.path.isdir(tok_dir):
        try:
            # Native BPE (models/diffusion/tokenizer.py) — no transformers
            # dependency; token ids match transformers.CLIPTokenizer.
            from neural_enhanced_super_resolution_tpu.models.diffusion.tokenizer import (
                ClipBpeTokenizer)
            tokenizer = ClipBpeTokenizer.from_pretrained(tok_dir)
        except Exception as exc:
            logger.warning("tokenizer load failed: %s", exc)

    model_index = {}
    mi_path = os.path.join(path, "model_index.json")
    if os.path.exists(mi_path):
        model_index = read_json(mi_path)

    return UpscalePipeline(
        unet_params, UNetConfig(**unet_config), vae_params,
        VAEConfig(**vae_config), text_params, CLIPTextConfig(**text_config),
        scheduler, low_res_scheduler, tokenizer, compute_dtype,
        max_noise_level=model_index.get("max_noise_level", 350),
        cfg_split=cfg_split)
