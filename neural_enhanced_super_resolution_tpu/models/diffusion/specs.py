"""Parameter name/shape specs for the diffusion components.

Mirrors the construction rules of the diffusers architectures implemented in
unet.py / vae.py / clip_text.py. Shapes are in OUR layouts (conv HWIO, linear
(in, out)). Used to:
  * random-initialise tiny models for tests (no published weights needed),
  * validate converted checkpoints (missing/unexpected key detection).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.diffusion.clip_text import (
    CLIPTextConfig)
from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
    UNetConfig)
from neural_enhanced_super_resolution_tpu.models.diffusion.vae import (
    VAEConfig)

__all__ = ["unet_param_shapes", "vae_param_shapes", "clip_param_shapes",
           "random_params", "validate_params"]


def _norm(spec, name, c):
    spec[f"{name}.weight"] = (c,)
    spec[f"{name}.bias"] = (c,)


def _conv(spec, name, cin, cout, k=3):
    spec[f"{name}.weight"] = (k, k, cin, cout)
    spec[f"{name}.bias"] = (cout,)


def _linear(spec, name, cin, cout, bias=True):
    spec[f"{name}.weight"] = (cin, cout)
    if bias:
        spec[f"{name}.bias"] = (cout,)


def _resnet_spec(spec, name, cin, cout, time_dim=None):
    _norm(spec, f"{name}.norm1", cin)
    _conv(spec, f"{name}.conv1", cin, cout)
    if time_dim is not None:
        _linear(spec, f"{name}.time_emb_proj", time_dim, cout)
    _norm(spec, f"{name}.norm2", cout)
    _conv(spec, f"{name}.conv2", cout, cout)
    if cin != cout:
        _conv(spec, f"{name}.conv_shortcut", cin, cout, k=1)


def _transformer_spec(spec, name, c, cross_dim):
    _norm(spec, f"{name}.norm", c)
    _linear(spec, f"{name}.proj_in", c, c)
    t = f"{name}.transformer_blocks.0"
    for ln in ("norm1", "norm2", "norm3"):
        _norm(spec, f"{t}.{ln}", c)
    for qkv in ("to_q", "to_k", "to_v"):
        _linear(spec, f"{t}.attn1.{qkv}", c, c, bias=False)
    _linear(spec, f"{t}.attn1.to_out.0", c, c)
    _linear(spec, f"{t}.attn2.to_q", c, c, bias=False)
    _linear(spec, f"{t}.attn2.to_k", cross_dim, c, bias=False)
    _linear(spec, f"{t}.attn2.to_v", cross_dim, c, bias=False)
    _linear(spec, f"{t}.attn2.to_out.0", c, c)
    _linear(spec, f"{t}.ff.net.0.proj", c, 8 * c)
    _linear(spec, f"{t}.ff.net.2", 4 * c, c)
    _linear(spec, f"{name}.proj_out", c, c)


def unet_param_shapes(cfg: UNetConfig) -> dict[str, tuple]:
    spec: dict[str, tuple] = {}
    b = cfg.block_out_channels
    time_dim = 4 * b[0]
    L = cfg.layers_per_block

    _linear(spec, "time_embedding.linear_1", b[0], time_dim)
    _linear(spec, "time_embedding.linear_2", time_dim, time_dim)
    if cfg.num_class_embeds:
        spec["class_embedding.weight"] = (cfg.num_class_embeds, time_dim)
    _conv(spec, "conv_in", cfg.in_channels, b[0])

    skip_channels = [b[0]]
    cin = b[0]
    for bi, btype in enumerate(cfg.down_block_types):
        bname = f"down_blocks.{bi}"
        for li in range(L):
            _resnet_spec(spec, f"{bname}.resnets.{li}", cin, b[bi], time_dim)
            cin = b[bi]
            if btype == "CrossAttnDownBlock2D":
                _transformer_spec(spec, f"{bname}.attentions.{li}", b[bi],
                                  cfg.cross_attention_dim)
            skip_channels.append(b[bi])
        if bi < len(b) - 1:
            _conv(spec, f"{bname}.downsamplers.0.conv", b[bi], b[bi])
            skip_channels.append(b[bi])

    _resnet_spec(spec, "mid_block.resnets.0", b[-1], b[-1], time_dim)
    if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
        _transformer_spec(spec, "mid_block.attentions.0", b[-1],
                          cfg.cross_attention_dim)
    _resnet_spec(spec, "mid_block.resnets.1", b[-1], b[-1], time_dim)

    c = b[-1]
    for ui, btype in enumerate(cfg.up_block_types):
        bname = f"up_blocks.{ui}"
        bi = len(b) - 1 - ui
        for li in range(L + 1):
            skip = skip_channels.pop()
            _resnet_spec(spec, f"{bname}.resnets.{li}", c + skip, b[bi],
                         time_dim)
            c = b[bi]
            if btype == "CrossAttnUpBlock2D":
                _transformer_spec(spec, f"{bname}.attentions.{li}", b[bi],
                                  cfg.cross_attention_dim)
        if ui < len(b) - 1:
            _conv(spec, f"{bname}.upsamplers.0.conv", b[bi], b[bi])

    _norm(spec, "conv_norm_out", b[0])
    _conv(spec, "conv_out", b[0], cfg.out_channels)
    return spec


def vae_param_shapes(cfg: VAEConfig, decoder_only: bool = False
                     ) -> dict[str, tuple]:
    spec: dict[str, tuple] = {}
    b = cfg.block_out_channels
    L = cfg.layers_per_block
    rev = list(reversed(b))

    _conv(spec, "post_quant_conv", cfg.latent_channels, cfg.latent_channels,
          k=1)
    _conv(spec, "decoder.conv_in", cfg.latent_channels, b[-1])
    _resnet_spec(spec, "decoder.mid_block.resnets.0", b[-1], b[-1])
    mid = "decoder.mid_block.attentions.0"
    _norm(spec, f"{mid}.group_norm", b[-1])
    for qkv in ("to_q", "to_k", "to_v"):
        _linear(spec, f"{mid}.{qkv}", b[-1], b[-1])
    _linear(spec, f"{mid}.to_out.0", b[-1], b[-1])
    _resnet_spec(spec, "decoder.mid_block.resnets.1", b[-1], b[-1])

    c = b[-1]
    for ui in range(len(b)):
        bname = f"decoder.up_blocks.{ui}"
        for li in range(L + 1):
            _resnet_spec(spec, f"{bname}.resnets.{li}", c, rev[ui])
            c = rev[ui]
        if ui < len(b) - 1:
            _conv(spec, f"{bname}.upsamplers.0.conv", c, c)
    _norm(spec, "decoder.conv_norm_out", b[0])
    _conv(spec, "decoder.conv_out", b[0], cfg.out_channels)

    if not decoder_only:
        _conv(spec, "quant_conv", 2 * cfg.latent_channels,
              2 * cfg.latent_channels, k=1)
        _conv(spec, "encoder.conv_in", cfg.in_channels, b[0])
        c = b[0]
        for bi in range(len(b)):
            bname = f"encoder.down_blocks.{bi}"
            for li in range(L):
                _resnet_spec(spec, f"{bname}.resnets.{li}", c, b[bi])
                c = b[bi]
            if bi < len(b) - 1:
                _conv(spec, f"{bname}.downsamplers.0.conv", b[bi], b[bi])
        _resnet_spec(spec, "encoder.mid_block.resnets.0", b[-1], b[-1])
        enc_mid = "encoder.mid_block.attentions.0"
        _norm(spec, f"{enc_mid}.group_norm", b[-1])
        for qkv in ("to_q", "to_k", "to_v"):
            _linear(spec, f"{enc_mid}.{qkv}", b[-1], b[-1])
        _linear(spec, f"{enc_mid}.to_out.0", b[-1], b[-1])
        _resnet_spec(spec, "encoder.mid_block.resnets.1", b[-1], b[-1])
        _norm(spec, "encoder.conv_norm_out", b[-1])
        _conv(spec, "encoder.conv_out", b[-1], 2 * cfg.latent_channels)
    return spec


def clip_param_shapes(cfg: CLIPTextConfig) -> dict[str, tuple]:
    spec: dict[str, tuple] = {}
    h = cfg.hidden_size
    spec["text_model.embeddings.token_embedding.weight"] = (cfg.vocab_size, h)
    spec["text_model.embeddings.position_embedding.weight"] = (
        cfg.max_position_embeddings, h)
    for i in range(cfg.num_hidden_layers):
        base = f"text_model.encoder.layers.{i}"
        _norm(spec, f"{base}.layer_norm1", h)
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(spec, f"{base}.self_attn.{p}", h, h)
        _norm(spec, f"{base}.layer_norm2", h)
        _linear(spec, f"{base}.mlp.fc1", h, cfg.intermediate_size)
        _linear(spec, f"{base}.mlp.fc2", cfg.intermediate_size, h)
    _norm(spec, "text_model.final_layer_norm", h)
    return spec


def random_params(spec: dict[str, tuple], key: jax.Array,
                  scale: float = 0.05) -> dict:
    """Gaussian random params for a spec (tests / benchmarks)."""
    params = {}
    keys = jax.random.split(key, len(spec))
    for (name, shape), k in zip(sorted(spec.items()), keys):
        if name.endswith(".bias") or "norm" in name.split(".")[-2]:
            params[name] = (jnp.ones(shape, jnp.float32)
                            if name.endswith("norm.weight")
                            or ".weight" in name and "norm" in name
                            else jnp.zeros(shape, jnp.float32))
        else:
            params[name] = scale * jax.random.normal(k, shape, jnp.float32)
    # norm weights must be 1, biases 0 — fix up explicitly:
    for name, shape in spec.items():
        last = name.split(".")[-2] if "." in name else ""
        if ("norm" in last or last.endswith("layer_norm")):
            params[name] = (jnp.ones(shape, jnp.float32)
                            if name.endswith(".weight")
                            else jnp.zeros(shape, jnp.float32))
        elif name.endswith(".bias"):
            params[name] = jnp.zeros(shape, jnp.float32)
    return params


def validate_params(params: dict, spec: dict[str, tuple]
                    ) -> tuple[list[str], list[str]]:
    """Returns (missing, unexpected) parameter names vs. a spec."""
    missing = [k for k in spec if k not in params]
    unexpected = [k for k in params if k not in spec]
    return missing, unexpected
