"""SwinIR (Swin-transformer SR) — TPU-native JAX implementation.

The reference DOCUMENTS this model but never implements it: the
``use_swinir`` config key exists (/root/reference/nesr/nesr.py:37 — "Not
implemented in this version") and the standalone pipeline carries a
placeholder branch that always returns None
(/root/reference/standalone/superres_project.py:80-88, :288-296). Here it
is a real third upscaling branch feeding the ensemble, as that code
intended (superres_project.py:158-163).

Architecture (Liang et al. 2021, official JingyunLiang/SwinIR layout so
published checkpoints convert directly):
  conv_first (3x3) -> RSTB x L [each: STL x depth -> conv3x3, residual]
  -> norm -> conv_after_body (+ residual) -> upsampler -> conv_last
STL = window multi-head self-attention (8x8 windows, relative position
bias, shifted every other layer with cross-window masking) + 2-layer MLP,
pre-LayerNorm, GELU.

TPU-first decisions:
  * NHWC end to end; window partition/merge are reshape+transpose pairs
    that XLA folds into the attention's own layout changes — no gathers.
  * The relative-position bias and shift masks are precomputed host-side
    per (window, shift) and closed over as constants — zero device
    bookkeeping per step.
  * Window attention runs as batched einsums over (B*nW, 64, C) — 64-token
    sequences are far below the flash-attention crossover, so the XLA path
    is the fast one (kernels/attention.py auto-dispatch reasoning).
  * Static shapes: inputs are padded to window multiples (reflect), the
    pad is cropped after upsampling — one jit specialization per tile
    bucket, same policy as the RRDB path.

Both upsampler variants are supported: "pixelshuffle" (classical SR
checkpoints) and "nearest+conv" (real-world GAN checkpoints, ESRGAN-style
head).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["SwinIRConfig", "swinir_param_shapes", "init_swinir",
           "swinir_forward", "swinir_params_from_state_dict",
           "load_swinir", "SwinIRModel"]


class SwinIRConfig:
    """Static hyperparameters (hashable jit static)."""

    def __init__(self, img_range: float = 1.0, scale: int = 4,
                 embed_dim: int = 180, depths: tuple = (6, 6, 6, 6, 6, 6),
                 num_heads: tuple = (6, 6, 6, 6, 6, 6),
                 window_size: int = 8, mlp_ratio: float = 2.0,
                 num_feat: int = 64, upsampler: str = "nearest+conv",
                 in_ch: int = 3, out_ch: int = 3):
        self.img_range = float(img_range)
        self.scale = scale
        self.embed_dim = embed_dim
        self.depths = tuple(depths)
        self.num_heads = tuple(num_heads)
        self.window_size = window_size
        self.mlp_ratio = mlp_ratio
        self.num_feat = num_feat
        self.upsampler = upsampler
        self.in_ch = in_ch
        self.out_ch = out_ch

    def _key(self):
        return (self.img_range, self.scale, self.embed_dim, self.depths,
                self.num_heads, self.window_size, self.mlp_ratio,
                self.num_feat, self.upsampler, self.in_ch, self.out_ch)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, SwinIRConfig) and self._key() == other._key()

    def __repr__(self):
        return f"SwinIRConfig{self._key()}"


# official SwinIR RGB mean (used for all 3-channel checkpoints)
_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


# ------------------------------------------------------------- params -------

def swinir_param_shapes(cfg: SwinIRConfig) -> dict:
    """Flat {torch-name: shape} spec in OUR layout (HWIO convs, (in, out)
    linears) — torch names so converted checkpoints validate key-by-key."""
    c, w = cfg.embed_dim, cfg.window_size
    spec = {"conv_first.weight": (3, 3, cfg.in_ch, c),
            "conv_first.bias": (c,)}

    def norm(name):
        spec[f"{name}.weight"] = (c,)
        spec[f"{name}.bias"] = (c,)

    for li, depth in enumerate(cfg.depths):
        for bi in range(depth):
            b = f"layers.{li}.residual_group.blocks.{bi}"
            norm(f"{b}.norm1")
            spec[f"{b}.attn.relative_position_bias_table"] = \
                ((2 * w - 1) ** 2, cfg.num_heads[li])
            spec[f"{b}.attn.qkv.weight"] = (c, 3 * c)
            spec[f"{b}.attn.qkv.bias"] = (3 * c,)
            spec[f"{b}.attn.proj.weight"] = (c, c)
            spec[f"{b}.attn.proj.bias"] = (c,)
            norm(f"{b}.norm2")
            hidden = int(c * cfg.mlp_ratio)
            spec[f"{b}.mlp.fc1.weight"] = (c, hidden)
            spec[f"{b}.mlp.fc1.bias"] = (hidden,)
            spec[f"{b}.mlp.fc2.weight"] = (hidden, c)
            spec[f"{b}.mlp.fc2.bias"] = (c,)
        spec[f"layers.{li}.conv.weight"] = (3, 3, c, c)
        spec[f"layers.{li}.conv.bias"] = (c,)
    norm("norm")
    spec["conv_after_body.weight"] = (3, 3, c, c)
    spec["conv_after_body.bias"] = (c,)

    f = cfg.num_feat
    if cfg.upsampler == "pixelshuffle":
        spec["conv_before_upsample.0.weight"] = (3, 3, c, f)
        spec["conv_before_upsample.0.bias"] = (f,)
        n2x = int(math.log2(cfg.scale))
        for k in range(n2x):
            spec[f"upsample.{2 * k}.weight"] = (3, 3, f, 4 * f)
            spec[f"upsample.{2 * k}.bias"] = (4 * f,)
        spec["conv_last.weight"] = (3, 3, f, cfg.out_ch)
        spec["conv_last.bias"] = (cfg.out_ch,)
    else:  # nearest+conv (real-world SR, scale 4)
        spec["conv_before_upsample.0.weight"] = (3, 3, c, f)
        spec["conv_before_upsample.0.bias"] = (f,)
        for name in ("conv_up1", "conv_up2", "conv_hr"):
            spec[f"{name}.weight"] = (3, 3, f, f)
            spec[f"{name}.bias"] = (f,)
        spec["conv_last.weight"] = (3, 3, f, cfg.out_ch)
        spec["conv_last.bias"] = (cfg.out_ch,)
    return spec


def init_swinir(key: jax.Array, cfg: SwinIRConfig) -> dict:
    """Random params (trunc-normal-ish; real use converts checkpoints)."""
    spec = swinir_param_shapes(cfg)
    params = {}
    for i, (name, shape) in enumerate(sorted(spec.items())):
        k = jax.random.fold_in(key, i)
        if name.endswith(".bias") or "norm" in name and \
                name.endswith(".bias"):
            params[name] = jnp.zeros(shape, jnp.float32)
        elif ("norm.weight" in name or name.endswith("norm1.weight")
              or name.endswith("norm2.weight")):
            params[name] = jnp.ones(shape, jnp.float32)
        else:
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            params[name] = jax.random.normal(k, shape, jnp.float32) * \
                (0.02 if len(shape) == 2 else float(1 / np.sqrt(fan_in)))
    return params


# ------------------------------------------------------- static tables ------

@functools.lru_cache(maxsize=32)
def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) int indices into the (2w-1)^2 bias table (standard swin)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (w - 1)                 # to >= 0
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int64)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """(nW, n, n) additive mask (-100 on cross-region pairs) for shifted
    windows on a (hp, wp) padded grid — the official SwinIR construction."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, w * w)                         # (nW, n)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ------------------------------------------------------------ forward -------

def _ln(x, p, name, cdt):
    mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) - mu) * lax.rsqrt(var + 1e-5)
    return (y * p[f"{name}.weight"] + p[f"{name}.bias"]).astype(cdt)


def _lin(x, p, name, cdt):
    y = jnp.einsum("...i,io->...o", x.astype(cdt),
                   p[f"{name}.weight"].astype(cdt),
                   preferred_element_type=jnp.float32)
    return (y + p[f"{name}.bias"].astype(jnp.float32)).astype(cdt)


def _conv3(x, p, name, cdt):
    y = lax.conv_general_dilated(
        x.astype(cdt), p[f"{name}.weight"].astype(cdt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p[f"{name}.bias"].astype(jnp.float32)).astype(cdt)


def _window_attention(xw, p, base, heads, bias, mask, cdt):
    """xw: (B*nW, n, C); bias: (heads, n, n) np; mask: (nW, n, n) np|None."""
    bn, n, c = xw.shape
    hd = c // heads
    qkv = _lin(xw, p, f"{base}.attn.qkv", cdt)             # (bn, n, 3c)
    qkv = qkv.reshape(bn, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # (bn, heads, n, hd)
    s = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                   preferred_element_type=jnp.float32)
    s = s + jnp.asarray(bias)[None]
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(bn // nw, nw, heads, n, n) + \
            jnp.asarray(mask)[None, :, None]
        s = s.reshape(bn, heads, n, n)
    a = jax.nn.softmax(s, axis=-1).astype(cdt)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v.astype(cdt),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(bn, n, c).astype(cdt)
    return _lin(o, p, f"{base}.attn.proj", cdt)


def _stl(x, p, base, cfg, li, shift, cdt):
    """One Swin transformer layer on (B, H, W, C); H, W divide window."""
    b, h, w, c = x.shape
    ws = cfg.window_size
    heads = cfg.num_heads[li]
    n = ws * ws

    idx = _relative_position_index(ws)
    table = p[f"{base}.attn.relative_position_bias_table"]  # ((2w-1)^2, H)
    bias_t = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, heads)
    bias_t = bias_t.transpose(2, 0, 1).astype(jnp.float32)  # (heads, n, n)

    shortcut = x
    y = _ln(x, p, f"{base}.norm1", cdt)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(h, w, ws, shift)
    else:
        mask = None
    yw = y.reshape(b, h // ws, ws, w // ws, ws, c)
    yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, c)
    ow = _window_attention(yw, p, base, heads, bias_t, mask, cdt)
    o = ow.reshape(b, h // ws, w // ws, ws, ws, c)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    if shift:
        o = jnp.roll(o, (shift, shift), axis=(1, 2))
    x = (shortcut.astype(jnp.float32) + o.astype(jnp.float32)).astype(cdt)

    y = _ln(x, p, f"{base}.norm2", cdt)
    y = _lin(y, p, f"{base}.mlp.fc1", cdt)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(cdt)
    y = _lin(y, p, f"{base}.mlp.fc2", cdt)
    return (x.astype(jnp.float32) + y.astype(jnp.float32)).astype(cdt)


def _nearest_x2(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _pixel_shuffle(x, r):
    """torch PixelShuffle on NHWC with OIHW-derived channel order."""
    n, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def swinir_forward(params: dict, x: jax.Array, cfg: SwinIRConfig,
                   compute_dtype: str = "bfloat16") -> jax.Array:
    """x: (B, H, W, 3) f32 in [0, 1] -> (B, sH, sW, 3) f32.

    H, W are padded internally (reflect) to window multiples and the
    output is cropped back — the official check_image_size behaviour.
    """
    cdt = jnp.dtype(compute_dtype)
    b, h, w, _ = x.shape
    ws = cfg.window_size
    ph = (-h) % ws
    pw = (-w) % ws
    if ph or pw:
        # official SwinIR uses reflect padding (check_image_size)
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    hp, wp = h + ph, w + pw

    mean = jnp.asarray(_RGB_MEAN if cfg.in_ch == 3 else
                       np.zeros(cfg.in_ch, np.float32))
    x = (x - mean) * cfg.img_range

    feat = _conv3(x, params, "conv_first", cdt)

    body = feat
    for li, depth in enumerate(cfg.depths):
        gin = body
        for bi in range(depth):
            base = f"layers.{li}.residual_group.blocks.{bi}"
            shift = 0 if bi % 2 == 0 else ws // 2
            body = _stl(body, params, base, cfg, li, shift, cdt)
        body = _conv3(body, params, f"layers.{li}.conv", cdt)
        body = (body.astype(jnp.float32)
                + gin.astype(jnp.float32)).astype(cdt)
    body = _ln(body, params, "norm", cdt)
    feat = (feat.astype(jnp.float32)
            + _conv3(body, params, "conv_after_body", cdt)
            .astype(jnp.float32)).astype(cdt)

    if cfg.upsampler == "pixelshuffle":
        y = _lrelu(_conv3(feat, params, "conv_before_upsample.0", cdt))
        for k in range(int(math.log2(cfg.scale))):
            y = _conv3(y, params, f"upsample.{2 * k}", cdt)
            y = _pixel_shuffle(y, 2)
        out = _conv3(y, params, "conv_last", cdt)
    else:  # nearest+conv
        y = _lrelu(_conv3(feat, params, "conv_before_upsample.0", cdt))
        y = _lrelu(_conv3(_nearest_x2(y), params, "conv_up1", cdt))
        y = _lrelu(_conv3(_nearest_x2(y), params, "conv_up2", cdt))
        out = _conv3(_lrelu(_conv3(y, params, "conv_hr", cdt)),
                     params, "conv_last", cdt)

    out = out.astype(jnp.float32) / cfg.img_range + mean
    return out[:, :h * cfg.scale, :w * cfg.scale, :]


# ---------------------------------------------------------- conversion ------

def swinir_params_from_state_dict(sd: dict) -> dict:
    """torch SwinIR state dict -> our flat params (HWIO convs, (in,out)
    linears). Buffers (attn_mask, relative_position_index) are dropped —
    they are recomputed statically here."""
    out = {}
    for name, val in sd.items():
        a = np.asarray(val, np.float32)
        if name.endswith("attn_mask") or \
                name.endswith("relative_position_index"):
            continue
        if name.endswith(".weight") and a.ndim == 4:       # OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif name.endswith(".weight") and a.ndim == 2 and \
                "bias_table" not in name:
            a = a.T                                        # (out,in)->(in,out)
        out[name] = jnp.asarray(a)
    return out


# ------------------------------------------------------------- wrapper ------

class SwinIRModel:
    """Host-facing wrapper (same protocol as the ESRGAN entry)."""

    def __init__(self, params: dict, cfg: SwinIRConfig,
                 compute_dtype: str = "bfloat16"):
        self.params = params
        self.cfg = cfg
        self.compute_dtype = compute_dtype

    def upscale_batch(self, tiles_u8) -> jax.Array:
        """(N, H, W, 3) uint8 RGB -> (N, sH, sW, 3) uint8 RGB."""
        x = jnp.asarray(tiles_u8).astype(jnp.float32) / 255.0
        y = swinir_forward(self.params, x, self.cfg, self.compute_dtype)
        return jnp.clip(y * 255.0, 0.0, 255.0).astype(jnp.uint8)


def load_swinir(path: str | None = None,
                compute_dtype: str = "bfloat16",
                cfg: SwinIRConfig | None = None) -> SwinIRModel:
    """Load an official SwinIR checkpoint (.pth, 'params'/'params_ema'
    wrapped or flat)."""
    if path is None:
        from neural_enhanced_super_resolution_tpu.utils.downloader import (
            get_model_path)
        path = get_model_path("swinir")
    if not os.path.exists(path):
        raise FileNotFoundError(f"SwinIR checkpoint not found at {path}")
    from neural_enhanced_super_resolution_tpu.models.weights import (
        load_state_dict)
    sd = load_state_dict(path)
    params = swinir_params_from_state_dict(sd)
    if cfg is None:
        # infer the published real-world M x4 layout from the state dict
        c = params["conv_first.weight"].shape[-1]
        nl = 1 + max(int(k.split(".")[1]) for k in params
                     if k.startswith("layers."))
        depth = 1 + max(
            int(k.split(".")[4]) for k in params
            if k.startswith("layers.0.residual_group.blocks."))
        heads = params[
            "layers.0.residual_group.blocks.0.attn"
            ".relative_position_bias_table"].shape[-1]
        table = params[
            "layers.0.residual_group.blocks.0.attn"
            ".relative_position_bias_table"].shape[0]
        ws = (int(math.isqrt(table)) + 1) // 2
        hidden = params[
            "layers.0.residual_group.blocks.0.mlp.fc1.weight"].shape[-1]
        if "upsample.0.weight" in params:
            upsampler = "pixelshuffle"
            # one conv per 2x stage at indices 0, 2, 4, ...
            n2x = 1 + max(int(k.split(".")[1]) for k in params
                          if k.startswith("upsample.")) // 2
            scale = 2 ** n2x
        else:
            upsampler = "nearest+conv"   # real-world head is fixed x4
            scale = 4
        cfg = SwinIRConfig(
            scale=scale,
            embed_dim=c, depths=(depth,) * nl, num_heads=(heads,) * nl,
            window_size=ws, mlp_ratio=hidden / c, upsampler=upsampler,
            num_feat=params["conv_last.weight"].shape[2])
    return SwinIRModel(params, cfg, compute_dtype)
