"""AutoencoderKL decoder (diffusers-compatible subset) for the x4 upscaler.

The upscale pipeline only *decodes*: latents (N, H, W, 4) -> RGB
(N, 4H, 4W, 3) for the x4 upscaler's f=4 VAE (the low-res image conditions
the UNet in pixel space, so no encoder is needed at inference —
/root/reference/nesr/nesr.py:988-1031 only ever calls the pipeline forward).
An encoder is included for completeness (img2img-style uses).

Same conventions as unet.py: flat diffusers-named params, NHWC, bf16 compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
    attention, conv2d, group_norm, nearest_upsample_x2, silu)

__all__ = ["VAEConfig", "vae_decode", "vae_encode"]


class VAEConfig:
    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512),
                 layers_per_block=2, norm_num_groups=32,
                 scaling_factor=0.08333, **_ignored):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.latent_channels = latent_channels
        self.block_out_channels = tuple(block_out_channels)
        self.layers_per_block = layers_per_block
        self.norm_num_groups = norm_num_groups
        self.scaling_factor = scaling_factor

    def _key(self):
        return (self.in_channels, self.out_channels, self.latent_channels,
                self.block_out_channels, self.layers_per_block,
                self.norm_num_groups, self.scaling_factor)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, VAEConfig) and self._key() == other._key()


def _resnet(params, name, x, groups, dtype):
    h = group_norm(x, params, f"{name}.norm1", groups, eps=1e-6)
    h = conv2d(silu(h), params, f"{name}.conv1", dtype=dtype)
    h = group_norm(h, params, f"{name}.norm2", groups, eps=1e-6)
    h = conv2d(silu(h), params, f"{name}.conv2", dtype=dtype)
    if f"{name}.conv_shortcut.weight" in params:
        x = conv2d(x, params, f"{name}.conv_shortcut", padding=0, dtype=dtype)
    return x + h


def _attn_block(params, name, x, groups, dtype):
    n, h_, w_, c = x.shape
    res = x
    x = group_norm(x, params, f"{name}.group_norm", groups, eps=1e-6)
    flat = x.reshape(n, h_ * w_, c)
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        linear)
    q = linear(flat, params, f"{name}.to_q", dtype=dtype)
    k = linear(flat, params, f"{name}.to_k", dtype=dtype)
    v = linear(flat, params, f"{name}.to_v", dtype=dtype)
    # Mid-block attention runs at full latent resolution — S grows with the
    # image, so route through the flash-attention dispatcher.
    from neural_enhanced_super_resolution_tpu.kernels.attention import (
        attention_auto)
    out = attention_auto(q, k, v, num_heads=1, dtype=dtype)
    out = linear(out, params, f"{name}.to_out.0", dtype=dtype)
    return out.reshape(n, h_, w_, c) + res


def vae_decode(params: dict, latents: jax.Array, cfg: VAEConfig,
               compute_dtype: str = "bfloat16") -> jax.Array:
    """latents (N, h, w, latent_ch), already divided by scaling_factor.

    Returns RGB in [-1, 1], (N, h*f, w*f, 3) with f = 2^(len(blocks)-1).
    """
    dtype = jnp.dtype(compute_dtype)
    groups = cfg.norm_num_groups
    x = conv2d(latents, params, "post_quant_conv", padding=0, dtype=dtype)
    x = conv2d(x, params, "decoder.conv_in", dtype=dtype)

    # mid
    x = _resnet(params, "decoder.mid_block.resnets.0", x, groups, dtype)
    x = _attn_block(params, "decoder.mid_block.attentions.0", x, groups,
                    dtype)
    x = _resnet(params, "decoder.mid_block.resnets.1", x, groups, dtype)

    # up blocks (reversed channel order)
    n_blocks = len(cfg.block_out_channels)
    for ui in range(n_blocks):
        bname = f"decoder.up_blocks.{ui}"
        for li in range(cfg.layers_per_block + 1):
            x = _resnet(params, f"{bname}.resnets.{li}", x, groups, dtype)
        if ui < n_blocks - 1:
            x = conv2d(nearest_upsample_x2(x), params,
                       f"{bname}.upsamplers.0.conv", dtype=dtype)

    x = group_norm(x, params, "decoder.conv_norm_out", groups, eps=1e-6)
    x = conv2d(silu(x), params, "decoder.conv_out", dtype=dtype)
    return x.astype(jnp.float32)


def vae_encode(params: dict, image: jax.Array, cfg: VAEConfig,
               compute_dtype: str = "bfloat16") -> jax.Array:
    """image (N, H, W, 3) in [-1,1] -> moments (N, H/f, W/f, 2*latent_ch)."""
    dtype = jnp.dtype(compute_dtype)
    groups = cfg.norm_num_groups
    x = conv2d(image, params, "encoder.conv_in", dtype=dtype)
    n_blocks = len(cfg.block_out_channels)
    for bi in range(n_blocks):
        bname = f"encoder.down_blocks.{bi}"
        for li in range(cfg.layers_per_block):
            x = _resnet(params, f"{bname}.resnets.{li}", x, groups, dtype)
        if bi < n_blocks - 1:
            # diffusers VAE encoder: Downsample2D(padding=0) -> explicit
            # (0,1,0,1) asymmetric pad + VALID stride-2 conv.
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            w = params[f"{bname}.downsamplers.0.conv.weight"].astype(dtype)
            x = jax.lax.conv_general_dilated(
                x.astype(dtype), w, (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = x + params[f"{bname}.downsamplers.0.conv.bias"]
    x = _resnet(params, "encoder.mid_block.resnets.0", x, groups, dtype)
    x = _attn_block(params, "encoder.mid_block.attentions.0", x, groups,
                    dtype)
    x = _resnet(params, "encoder.mid_block.resnets.1", x, groups, dtype)
    x = group_norm(x, params, "encoder.conv_norm_out", groups, eps=1e-6)
    x = conv2d(silu(x), params, "encoder.conv_out", dtype=dtype)
    return conv2d(x, params, "quant_conv", padding=0, dtype=dtype)
