"""CLIP text encoder (transformers-compatible subset) for prompt conditioning.

The x4 upscaler conditions its UNet on text embeddings from a CLIP text tower
(the reference gets this implicitly through diffusers,
/root/reference/nesr/nesr.py:261). Config comes from the checkpoint's
``text_encoder/config.json``; weights are the HF ``CLIPTextModel`` state dict
converted to flat JAX params (convert.py). Tokenization uses
``transformers.CLIPTokenizer`` from the local snapshot (host-side only).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
    attention, layer_norm, linear)

__all__ = ["CLIPTextConfig", "clip_text_forward"]


class CLIPTextConfig:
    def __init__(self, vocab_size=49408, hidden_size=1024,
                 intermediate_size=4096, num_hidden_layers=23,
                 num_attention_heads=16, max_position_embeddings=77,
                 hidden_act="gelu", layer_norm_eps=1e-5, **_ignored):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps

    def _key(self):
        return (self.vocab_size, self.hidden_size, self.intermediate_size,
                self.num_hidden_layers, self.num_attention_heads,
                self.max_position_embeddings, self.hidden_act,
                self.layer_norm_eps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, CLIPTextConfig) and self._key() == other._key()


def _act(x, kind):
    if kind in ("quick_gelu",):
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def clip_text_forward(params: dict, input_ids: jax.Array,
                      cfg: CLIPTextConfig,
                      compute_dtype: str = "bfloat16") -> jax.Array:
    """input_ids (N, S) int32 -> last hidden state (N, S, hidden).

    Jitted: eager execution dispatched the 12-layer tower op by op, which
    over a remote-device tunnel costs ~30 s per process (measured in the
    round-5 config-5 stage table as a diffusion/clip row the size of the
    whole denoise loop). One jit program caches persistently like every
    other model forward."""
    dtype = jnp.dtype(compute_dtype)
    n, s = input_ids.shape
    tok = params["text_model.embeddings.token_embedding.weight"][input_ids]
    pos = params["text_model.embeddings.position_embedding.weight"][:s]
    x = tok.astype(jnp.float32) + pos.astype(jnp.float32)

    # causal mask (CLIP text towers are causal)
    causal = jnp.where(
        jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, -jnp.inf)
    causal = causal[None, None, :, :]

    for i in range(cfg.num_hidden_layers):
        base = f"text_model.encoder.layers.{i}"
        h = layer_norm(x, params, f"{base}.layer_norm1", cfg.layer_norm_eps)
        q = linear(h, params, f"{base}.self_attn.q_proj", dtype=dtype)
        k = linear(h, params, f"{base}.self_attn.k_proj", dtype=dtype)
        v = linear(h, params, f"{base}.self_attn.v_proj", dtype=dtype)
        h = attention(q, k, v, cfg.num_attention_heads, mask=causal,
                      dtype=dtype)
        x = x + linear(h, params, f"{base}.self_attn.out_proj", dtype=dtype)
        h = layer_norm(x, params, f"{base}.layer_norm2", cfg.layer_norm_eps)
        h = linear(h, params, f"{base}.mlp.fc1", dtype=dtype)
        h = _act(h, cfg.hidden_act)
        x = x + linear(h, params, f"{base}.mlp.fc2", dtype=dtype)

    return layer_norm(x, params, "text_model.final_layer_norm",
                      cfg.layer_norm_eps)
