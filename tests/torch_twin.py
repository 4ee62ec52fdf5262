"""Diffusers-faithful torch twins of the x4-upscaler UNet / VAE decoder and
schedulers, written independently (from the published diffusers architecture
semantics) for full-model parity tests.

The reference gets these networks from the diffusers package
(/root/reference/nesr/nesr.py:261); diffusers is not in this image, so this
module plays its role in tests: both sides consume the SAME diffusers-format
state dict (torch layouts: conv OIHW, linear (out, in)) and must produce the
same outputs. Architecture facts encoded here (resnet op order, GEGLU, linear
proj_in, skip bookkeeping, sinusoidal embedding with flip_sin_to_cos, DDIM /
DDPM update rules incl. set_alpha_to_one and variance clamping) come from the
published Stable Diffusion / diffusers model definitions, not from the JAX
code under test.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# ------------------------------------------------------------------ layers --

def _gn(sd, name, x, groups, eps=1e-5):
    return F.group_norm(x, groups, sd[f"{name}.weight"], sd[f"{name}.bias"],
                        eps=eps)


def _conv(sd, name, x, stride=1, padding=1):
    return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"],
                    stride=stride, padding=padding)


def _lin(sd, name, x):
    return F.linear(x, sd[f"{name}.weight"], sd.get(f"{name}.bias"))


def _resnet(sd, name, x, temb, groups):
    h = _conv(sd, f"{name}.conv1", F.silu(_gn(sd, f"{name}.norm1", x,
                                              groups)))
    if temb is not None:
        h = h + _lin(sd, f"{name}.time_emb_proj",
                     F.silu(temb))[:, :, None, None]
    h = _conv(sd, f"{name}.conv2", F.silu(_gn(sd, f"{name}.norm2", h,
                                              groups)))
    if f"{name}.conv_shortcut.weight" in sd:
        x = _conv(sd, f"{name}.conv_shortcut", x, padding=0)
    return x + h


def _mha(sd, name, x, ctx, heads):
    q = _lin(sd, f"{name}.to_q", x)
    k = _lin(sd, f"{name}.to_k", ctx)
    v = _lin(sd, f"{name}.to_v", ctx)
    b, s, d = q.shape
    dh = d // heads
    q = q.view(b, s, heads, dh).transpose(1, 2)
    k = k.view(b, ctx.shape[1], heads, dh).transpose(1, 2)
    v = v.view(b, ctx.shape[1], heads, dh).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, s, d)
    return _lin(sd, f"{name}.to_out.0", o)


def _transformer(sd, name, x, ctx, heads, groups):
    # Transformer2DModel with use_linear_projection=True (SD2-era)
    b, c, h, w = x.shape
    res = x
    y = _gn(sd, f"{name}.norm", x, groups, eps=1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    y = _lin(sd, f"{name}.proj_in", y)
    t = f"{name}.transformer_blocks.0"
    ln1 = F.layer_norm(y, (c,), sd[f"{t}.norm1.weight"],
                       sd[f"{t}.norm1.bias"])
    y = y + _mha(sd, f"{t}.attn1", ln1, ln1, heads)
    ln2 = F.layer_norm(y, (c,), sd[f"{t}.norm2.weight"],
                       sd[f"{t}.norm2.bias"])
    y = y + _mha(sd, f"{t}.attn2", ln2, ctx, heads)
    ln3 = F.layer_norm(y, (c,), sd[f"{t}.norm3.weight"],
                       sd[f"{t}.norm3.bias"])
    proj = _lin(sd, f"{t}.ff.net.0.proj", ln3)
    hidden, gate = proj.chunk(2, dim=-1)
    y = y + _lin(sd, f"{t}.ff.net.2", hidden * F.gelu(gate))
    y = _lin(sd, f"{name}.proj_out", y)
    return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


def _timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# ------------------------------------------------------------------- UNet ---

def torch_unet_forward(sd, sample, timestep, encoder_hidden_states,
                       class_labels, cfg) -> torch.Tensor:
    """cfg: the JAX UNetConfig (only reads plain attributes)."""
    groups = cfg.norm_num_groups
    b0 = cfg.block_out_channels[0]
    ctx = encoder_hidden_states
    L = cfg.layers_per_block

    t = torch.as_tensor(timestep).expand(sample.shape[0])
    temb = _timestep_embedding(t, b0)
    temb = _lin(sd, "time_embedding.linear_1", temb)
    temb = _lin(sd, "time_embedding.linear_2", F.silu(temb))
    if cfg.num_class_embeds and class_labels is not None:
        temb = temb + sd["class_embedding.weight"][class_labels]

    x = _conv(sd, "conv_in", sample)
    skips = [x]
    for bi, btype in enumerate(cfg.down_block_types):
        bname = f"down_blocks.{bi}"
        for li in range(L):
            x = _resnet(sd, f"{bname}.resnets.{li}", x, temb, groups)
            if btype == "CrossAttnDownBlock2D":
                x = _transformer(sd, f"{bname}.attentions.{li}", x, ctx,
                                 cfg.attention_head_dim[bi], groups)
            skips.append(x)
        if bi < len(cfg.down_block_types) - 1:
            x = _conv(sd, f"{bname}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    x = _resnet(sd, "mid_block.resnets.0", x, temb, groups)
    if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
        x = _transformer(sd, "mid_block.attentions.0", x, ctx,
                         cfg.attention_head_dim[-1], groups)
    x = _resnet(sd, "mid_block.resnets.1", x, temb, groups)

    for ui, btype in enumerate(cfg.up_block_types):
        bname = f"up_blocks.{ui}"
        bi = len(cfg.block_out_channels) - 1 - ui
        for li in range(L + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = _resnet(sd, f"{bname}.resnets.{li}", x, temb, groups)
            if btype == "CrossAttnUpBlock2D":
                x = _transformer(sd, f"{bname}.attentions.{li}", x, ctx,
                                 cfg.attention_head_dim[bi], groups)
        if ui < len(cfg.up_block_types) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(sd, f"{bname}.upsamplers.0.conv", x)

    x = _gn(sd, "conv_norm_out", x, groups)
    return _conv(sd, "conv_out", F.silu(x))


# ------------------------------------------------------------ VAE decoder ---

def torch_vae_decode(sd, latents, cfg) -> torch.Tensor:
    """latents already divided by scaling_factor; NCHW."""
    groups = cfg.norm_num_groups

    def attn_block(name, x):
        b, c, h, w = x.shape
        res = x
        y = _gn(sd, f"{name}.group_norm", x, groups, eps=1e-6)
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = _mha(sd, name, y, y, 1)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res

    def resnet(name, x):
        h = _conv(sd, f"{name}.conv1",
                  F.silu(_gn(sd, f"{name}.norm1", x, groups, eps=1e-6)))
        h = _conv(sd, f"{name}.conv2",
                  F.silu(_gn(sd, f"{name}.norm2", h, groups, eps=1e-6)))
        if f"{name}.conv_shortcut.weight" in sd:
            x = _conv(sd, f"{name}.conv_shortcut", x, padding=0)
        return x + h

    x = F.conv2d(latents, sd["post_quant_conv.weight"],
                 sd["post_quant_conv.bias"])
    x = _conv(sd, "decoder.conv_in", x)
    x = resnet("decoder.mid_block.resnets.0", x)
    x = attn_block("decoder.mid_block.attentions.0", x)
    x = resnet("decoder.mid_block.resnets.1", x)
    for ui in range(len(cfg.block_out_channels)):
        bname = f"decoder.up_blocks.{ui}"
        for li in range(cfg.layers_per_block + 1):
            x = resnet(f"{bname}.resnets.{li}", x)
        if ui < len(cfg.block_out_channels) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(sd, f"{bname}.upsamplers.0.conv", x)
    x = _gn(sd, "decoder.conv_norm_out", x, groups, eps=1e-6)
    return _conv(sd, "decoder.conv_out", F.silu(x))


# -------------------------------------------------------------- schedulers --

class TorchScheduler:
    """DDIM/DDPM step math as published (numpy/torch, independent impl)."""

    def __init__(self, kind, num_train_timesteps=1000, beta_start=1e-4,
                 beta_end=0.02, prediction_type="epsilon",
                 set_alpha_to_one=True, clip_sample=None):
        self.kind = kind
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2  # scaled_linear
        self.acp = np.cumprod(1.0 - betas)
        self.prediction_type = prediction_type
        self.final_acp = 1.0 if set_alpha_to_one else float(self.acp[0])
        if clip_sample is None:
            clip_sample = kind == "ddpm"
        self.clip_sample = clip_sample
        self.T = num_train_timesteps

    def timesteps(self, n):
        step = self.T // n
        return (np.arange(n) * step).round()[::-1].astype(np.int64)

    def _x0_eps(self, x, out, ab):
        if self.prediction_type == "epsilon":
            x0 = (x - np.sqrt(1 - ab) * out) / np.sqrt(ab)
            eps = out
        else:  # v_prediction
            x0 = np.sqrt(ab) * x - np.sqrt(1 - ab) * out
            eps = np.sqrt(ab) * out + np.sqrt(1 - ab) * x
        if self.clip_sample:
            x0 = np.clip(x0, -1.0, 1.0)
            eps = (x - np.sqrt(ab) * x0) / np.sqrt(1 - ab)
        return x0, eps

    def step(self, out, t, prev_t, x, noise=None):
        ab = float(self.acp[t])
        abp = float(self.acp[prev_t]) if prev_t >= 0 else (
            self.final_acp if self.kind == "ddim" else 1.0)
        x0, eps = self._x0_eps(x, out, ab)
        if self.kind == "ddim":
            return (np.sqrt(abp) * x0 + np.sqrt(1 - abp) * eps
                    ).astype(np.float32)
        alpha_t = ab / abp
        beta_t = 1 - alpha_t
        mean = (np.sqrt(abp) * beta_t / (1 - ab)) * x0 + \
               (np.sqrt(alpha_t) * (1 - abp) / (1 - ab)) * x
        var = max((1 - abp) / (1 - ab) * beta_t, 1e-20)
        sigma = np.sqrt(var) if t > 0 else 0.0
        return (mean + sigma * (noise if noise is not None else 0.0)
                ).astype(np.float32)

    def add_noise(self, x, noise, t):
        ab = float(self.acp[t])
        return (np.sqrt(ab) * x + np.sqrt(1 - ab) * noise
                ).astype(np.float32)
