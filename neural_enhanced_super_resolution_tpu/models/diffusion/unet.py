"""UNet2DConditionModel (diffusers-compatible subset) for the SD x4 upscaler.

Covers exactly the architecture family the reference's
``StableDiffusionUpscalePipeline`` instantiates
(/root/reference/nesr/nesr.py:261: stabilityai/stable-diffusion-x4-upscaler):
DownBlock2D / CrossAttnDownBlock2D / UNetMidBlock2DCrossAttn /
UpBlock2D / CrossAttnUpBlock2D, timestep + class (noise-level) embeddings,
GEGLU transformer blocks with self+cross attention.

Config comes straight from the checkpoint's ``config.json``; parameters are a
flat dict keyed by diffusers state-dict names (see layers.py). Forward is
NHWC / bf16-compute / f32-accumulate and fully jittable — the whole denoise
loop compiles to one XLA program.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
    attention, conv2d, group_norm, layer_norm, linear, nearest_upsample_x2,
    silu, timestep_embedding)

__all__ = ["UNetConfig", "unet_forward"]

# Self-attention formulation switch (trace-time, like NESR_CROSSATTN):
# "fused" projects q/k/v straight into head-major and folds the output
# relayout into the out projection (kernels.attention.fused_self_attention);
# "proj" is the round-3 separate-projection + attention_auto path.
# A/B harness: benchmarks/ab_selfattn_fused.py (RESULTS.md round-4
# self-attention relayout record).
SELFATTN_FORM = os.environ.get("NESR_SELFATTN", "proj")


class UNetConfig:
    """Hashable static config (subset of diffusers UNet2DConditionModel)."""

    def __init__(self, sample_size=128, in_channels=7, out_channels=4,
                 down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                                   "CrossAttnDownBlock2D",
                                   "CrossAttnDownBlock2D"),
                 up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                                 "CrossAttnUpBlock2D", "UpBlock2D"),
                 block_out_channels=(256, 512, 512, 1024),
                 layers_per_block=2, cross_attention_dim=1024,
                 attention_head_dim=8, num_class_embeds=1000,
                 norm_num_groups=32, mid_block_type="UNetMidBlock2DCrossAttn",
                 **_ignored):
        self.sample_size = sample_size
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.down_block_types = tuple(down_block_types)
        self.up_block_types = tuple(up_block_types)
        self.block_out_channels = tuple(block_out_channels)
        self.layers_per_block = layers_per_block
        self.cross_attention_dim = cross_attention_dim
        # diffusers allows per-block head dims; normalize to a tuple
        if isinstance(attention_head_dim, (list, tuple)):
            self.attention_head_dim = tuple(attention_head_dim)
        else:
            self.attention_head_dim = (attention_head_dim,) * len(
                self.block_out_channels)
        self.num_class_embeds = num_class_embeds
        self.norm_num_groups = norm_num_groups
        self.mid_block_type = mid_block_type

    def _key(self):
        return (self.sample_size, self.in_channels, self.out_channels,
                self.down_block_types, self.up_block_types,
                self.block_out_channels, self.layers_per_block,
                self.cross_attention_dim, self.attention_head_dim,
                self.num_class_embeds, self.norm_num_groups,
                self.mid_block_type)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, UNetConfig) and self._key() == other._key()


# ---------------------------------------------------------------- blocks ----

def _resnet(params, name, x, temb, groups, dtype):
    h = group_norm(x, params, f"{name}.norm1", groups)
    h = conv2d(silu(h), params, f"{name}.conv1", dtype=dtype)
    t = linear(silu(temb), params, f"{name}.time_emb_proj", dtype=dtype)
    h = h + t[:, None, None, :]
    h = group_norm(h, params, f"{name}.norm2", groups)
    h = conv2d(silu(h), params, f"{name}.conv2", dtype=dtype)
    if f"{name}.conv_shortcut.weight" in params:
        x = conv2d(x, params, f"{name}.conv_shortcut", padding=0, dtype=dtype)
    return x + h


def _geglu_ff(params, name, x, dtype):
    proj = linear(x, params, f"{name}.net.0.proj", dtype=dtype)
    a, gate = jnp.split(proj, 2, axis=-1)
    return linear(a * jax.nn.gelu(gate), params, f"{name}.net.2", dtype=dtype)


def _basic_transformer(params, name, x, context, heads, dtype, kv=None):
    # self-attention over the latent grid: Pallas flash kernel on TPU for
    # long sequences, XLA einsum otherwise (kernels/attention.py).
    from neural_enhanced_super_resolution_tpu.kernels.attention import (
        attention_auto)
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        SD_ABLATE, cross_attention)
    if "selfattn" not in SD_ABLATE:
        h = layer_norm(x, params, f"{name}.norm1")
        fused = None
        if SELFATTN_FORM == "fused" and "selfattn_core" not in SD_ABLATE:
            from neural_enhanced_super_resolution_tpu.kernels.attention import (
                fused_self_attention)
            # Returns None where the flash gate fails (short seq / non-TPU /
            # flash disabled) — intentionally the SAME gate as
            # attention_auto (kernels.attention._flash_gate), so an
            # NESR_SELFATTN=fused program is mixed by design: fused at
            # long-seq layers, separate-projection at short-seq layers.
            fused = fused_self_attention(h, params, f"{name}.attn1", heads,
                                         dtype=dtype)
        if fused is not None:
            x = x + fused
        else:
            q = linear(h, params, f"{name}.attn1.to_q", dtype=dtype)
            k = linear(h, params, f"{name}.attn1.to_k", dtype=dtype)
            v = linear(h, params, f"{name}.attn1.to_v", dtype=dtype)
            if "selfattn_core" in SD_ABLATE:  # profiling: ln+projections only
                h = q + jnp.sum(k) * 0 + jnp.sum(v) * 0
            else:
                h = attention_auto(q, k, v, heads, dtype=dtype)
            x = x + linear(h, params, f"{name}.attn1.to_out.0", dtype=dtype)
    if "crossattn" not in SD_ABLATE:
        if "crossattn_ln" in SD_ABLATE:  # profiling: layer-norm only
            x = x + 0.001 * layer_norm(x, params, f"{name}.norm2")
        else:
            h = layer_norm(x, params, f"{name}.norm2")
            q = linear(h, params, f"{name}.attn2.to_q", dtype=dtype)
            if "crossattn_kv" in SD_ABLATE:  # profiling: no ctx projections
                h = q
            else:
                if kv is not None:
                    # K/V precomputed ONCE per denoise call (hoisted out of
                    # the step loop — precompute_context_kv below).
                    k, v = kv
                else:
                    k = linear(context, params, f"{name}.attn2.to_k",
                               dtype=dtype)
                    v = linear(context, params, f"{name}.attn2.to_v",
                               dtype=dtype)
                if "crossattn_core" in SD_ABLATE:  # profiling: no einsums
                    h = q + jnp.sum(k) * 0 + jnp.sum(v) * 0
                else:
                    h = cross_attention(q, k, v, heads, dtype=dtype)
            x = x + linear(h, params, f"{name}.attn2.to_out.0", dtype=dtype)
    if "ff" in SD_ABLATE:
        return x
    h = layer_norm(x, params, f"{name}.norm3")
    return x + _geglu_ff(params, f"{name}.ff", h, dtype)


def _transformer2d(params, name, x, context, heads, groups, dtype, kv=None):
    n, h_, w_, c = x.shape
    res = x
    x = group_norm(x, params, f"{name}.norm", groups, eps=1e-6)
    x = linear(x.reshape(n, h_ * w_, c), params, f"{name}.proj_in",
               dtype=dtype)
    x = _basic_transformer(params, f"{name}.transformer_blocks.0", x, context,
                           heads, dtype, kv=kv)
    x = linear(x, params, f"{name}.proj_out", dtype=dtype)
    return x.reshape(n, h_, w_, c) + res


def crossattn_layer_names(cfg: "UNetConfig") -> tuple:
    """The _transformer2d layer names of a forward pass, in call order."""
    names = []
    for bi, btype in enumerate(cfg.down_block_types):
        if btype == "CrossAttnDownBlock2D":
            for li in range(cfg.layers_per_block):
                names.append(f"down_blocks.{bi}.attentions.{li}")
    if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
        names.append("mid_block.attentions.0")
    for ui, btype in enumerate(cfg.up_block_types):
        if btype == "CrossAttnUpBlock2D":
            for li in range(cfg.layers_per_block + 1):
                names.append(f"up_blocks.{ui}.attentions.{li}")
    return tuple(names)


def precompute_context_kv(params: dict, context: jax.Array, cfg: "UNetConfig",
                          compute_dtype: str = "bfloat16") -> dict:
    """Hoist the text-context K/V projections out of the denoise loop.

    Every attn2 layer's K/V depends only on the text embedding, which is
    constant across denoise steps — but computed inside the step fori_loop
    they compile to per-step skinny (77, ctx_dim) matmuls that XLA does NOT
    hoist, measured at ~half the whole UNet step's wall-clock (ablation
    split, RESULTS.md round-4 cross-attention record). Returns
    {transformer2d_name: (k, v)} for unet_forward's context_kv argument;
    slice the leading batch axis to match each pass's context batch.
    """
    dtype = jnp.dtype(compute_dtype)
    kv = {}
    for name in crossattn_layer_names(cfg):
        prefix = f"{name}.transformer_blocks.0.attn2"
        kv[name] = (linear(context, params, f"{prefix}.to_k", dtype=dtype),
                    linear(context, params, f"{prefix}.to_v", dtype=dtype))
    return kv


def _downsample(params, name, x, dtype):
    # diffusers Downsample2D: 3x3 stride-2 conv with asymmetric (0,1) padding
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    w = params[f"{name}.conv.weight"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + params[f"{name}.conv.bias"].astype(jnp.float32)


def _upsample(params, name, x, dtype):
    return conv2d(nearest_upsample_x2(x), params, f"{name}.conv", dtype=dtype)


# --------------------------------------------------------------- forward ----

def unet_forward(params: dict, sample: jax.Array, timestep: jax.Array,
                 encoder_hidden_states: jax.Array,
                 class_labels: jax.Array | None, cfg: UNetConfig,
                 compute_dtype: str = "bfloat16",
                 context_kv: dict | None = None) -> jax.Array:
    """sample: (N, H, W, in_channels); returns (N, H, W, out_channels).

    context_kv: optional precomputed per-layer cross-attention K/V
    (precompute_context_kv) — pass when calling from inside a step loop so
    the context projections don't recompute every step.
    """
    dtype = jnp.dtype(compute_dtype)
    groups = cfg.norm_num_groups
    ctx = encoder_hidden_states
    ckv = context_kv or {}

    # time + class embeddings
    temb = timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(timestep),
                                               (sample.shape[0],)),
                              cfg.block_out_channels[0])
    temb = linear(temb, params, "time_embedding.linear_1", dtype=dtype)
    temb = linear(silu(temb), params, "time_embedding.linear_2", dtype=dtype)
    if cfg.num_class_embeds and class_labels is not None:
        cemb = params["class_embedding.weight"][class_labels]
        temb = temb + cemb.astype(jnp.float32)

    x = conv2d(sample, params, "conv_in", dtype=dtype)

    # down
    skips = [x]
    for bi, btype in enumerate(cfg.down_block_types):
        bname = f"down_blocks.{bi}"
        for li in range(cfg.layers_per_block):
            x = _resnet(params, f"{bname}.resnets.{li}", x, temb, groups,
                        dtype)
            if btype == "CrossAttnDownBlock2D":
                # NB: diffusers' "attention_head_dim" is historically the
                # NUMBER of heads in SD1/SD-x4-era UNet configs.
                lname = f"{bname}.attentions.{li}"
                x = _transformer2d(params, lname, x, ctx,
                                   cfg.attention_head_dim[bi], groups, dtype,
                                   kv=ckv.get(lname))
            skips.append(x)
        if bi < len(cfg.down_block_types) - 1:
            x = _downsample(params, f"{bname}.downsamplers.0", x, dtype)
            skips.append(x)

    # mid
    x = _resnet(params, "mid_block.resnets.0", x, temb, groups, dtype)
    if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
        x = _transformer2d(params, "mid_block.attentions.0", x, ctx,
                           cfg.attention_head_dim[-1], groups, dtype,
                           kv=ckv.get("mid_block.attentions.0"))
    x = _resnet(params, "mid_block.resnets.1", x, temb, groups, dtype)

    # up
    for ui, btype in enumerate(cfg.up_block_types):
        bname = f"up_blocks.{ui}"
        bi = len(cfg.block_out_channels) - 1 - ui
        for li in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = _resnet(params, f"{bname}.resnets.{li}", x, temb, groups,
                        dtype)
            if btype == "CrossAttnUpBlock2D":
                lname = f"{bname}.attentions.{li}"
                x = _transformer2d(params, lname, x, ctx,
                                   cfg.attention_head_dim[bi], groups, dtype,
                                   kv=ckv.get(lname))
        if ui < len(cfg.up_block_types) - 1:
            x = _upsample(params, f"{bname}.upsamplers.0", x, dtype)

    x = group_norm(x, params, "conv_norm_out", groups)
    x = conv2d(silu(x), params, "conv_out", dtype=dtype)
    return x.astype(jnp.float32)
