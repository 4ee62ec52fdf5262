"""JAX Stable Diffusion x4 upscaler stack: CLIP text, UNet, VAE, schedulers.

TPU-native replacement for the reference's diffusers dependency
(SURVEY.md §2b row "Stable Diffusion x4 latent upscaler").
"""

from neural_enhanced_super_resolution_tpu.models.diffusion.pipeline import (
    UpscalePipeline, load_upscale_pipeline)
from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
    DDPMScheduler, DDIMScheduler)
from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
    UNetConfig, unet_forward)
from neural_enhanced_super_resolution_tpu.models.diffusion.vae import (
    VAEConfig, vae_decode, vae_encode)
from neural_enhanced_super_resolution_tpu.models.diffusion.clip_text import (
    CLIPTextConfig, clip_text_forward)

__all__ = [
    "UpscalePipeline", "load_upscale_pipeline",
    "DDPMScheduler", "DDIMScheduler",
    "UNetConfig", "unet_forward",
    "VAEConfig", "vae_decode", "vae_encode",
    "CLIPTextConfig", "clip_text_forward",
]
