"""Independent torch implementation of SwinIR forward (parity oracle).

Written from the published architecture (Liang et al. 2021; official
JingyunLiang/SwinIR module layout) in plain torch ops — NOT a copy of
either the official code or our JAX port — so tests compare two
independent implementations consuming the same state dict.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _ln(sd, name, x):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{name}.weight"],
                        sd[f"{name}.bias"], eps=1e-5)


def _lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _conv(sd, name, x):
    return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)


def _rel_index(w):
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


def _attn_mask(hp, wp, w, shift):
    img = torch.zeros(1, hp, wp, 1)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws_, :] = cnt
            cnt += 1
    wins = img.view(1, hp // w, w, wp // w, w, 1)
    wins = wins.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    diff = wins.unsqueeze(1) - wins.unsqueeze(2)
    return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))


def _window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.view(b, h // w, w, wd // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_merge(xw, w, h, wd):
    b = xw.shape[0] // ((h // w) * (wd // w))
    x = xw.view(b, h // w, wd // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def _stl(sd, base, x, heads, window, shift):
    b, h, wd, c = x.shape
    n = window * window
    shortcut = x
    y = _ln(sd, f"{base}.norm1", x)
    if shift:
        y = torch.roll(y, (-shift, -shift), dims=(1, 2))
    yw = _window_partition(y, window)
    qkv = _lin(sd, f"{base}.attn.qkv", yw)
    qkv = qkv.view(-1, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = (q * (c // heads) ** -0.5) @ k.transpose(-2, -1)
    table = sd[f"{base}.attn.relative_position_bias_table"]
    bias = table[_rel_index(window).view(-1)].view(n, n, heads)
    s = s + bias.permute(2, 0, 1).unsqueeze(0)
    if shift:
        mask = _attn_mask(h, wd, window, shift)
        nw = mask.shape[0]
        s = s.view(-1, nw, heads, n, n) + mask.unsqueeze(0).unsqueeze(2)
        s = s.view(-1, heads, n, n)
    a = torch.softmax(s, dim=-1)
    o = (a @ v).transpose(1, 2).reshape(-1, n, c)
    o = _lin(sd, f"{base}.attn.proj", o)
    o = _window_merge(o, window, h, wd)
    if shift:
        o = torch.roll(o, (shift, shift), dims=(1, 2))
    x = shortcut + o
    y = _ln(sd, f"{base}.norm2", x)
    y = _lin(sd, f"{base}.mlp.fc2", F.gelu(_lin(sd, f"{base}.mlp.fc1", y)))
    return x + y


def torch_swinir_forward(sd, x, cfg):
    """sd: torch state dict (official names, OIHW). x: (B,3,H,W) f32 [0,1].
    cfg: our SwinIRConfig (plain attributes only)."""
    w = cfg.window_size
    b, _, h, wd = x.shape
    ph, pw = (-h) % w, (-wd) % w
    if ph or pw:
        x = F.pad(x, (0, pw, 0, ph), mode="reflect")
    mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
    x = (x - mean) * cfg.img_range

    feat = _conv(sd, "conv_first", x)
    body = feat.permute(0, 2, 3, 1)                         # NHWC
    for li, depth in enumerate(cfg.depths):
        gin = body
        for bi in range(depth):
            base = f"layers.{li}.residual_group.blocks.{bi}"
            shift = 0 if bi % 2 == 0 else w // 2
            body = _stl(sd, base, body, cfg.num_heads[li], w, shift)
        conv_in = body.permute(0, 3, 1, 2)
        body = _conv(sd, f"layers.{li}.conv", conv_in).permute(0, 2, 3, 1) \
            + gin
    body = _ln(sd, "norm", body).permute(0, 3, 1, 2)
    feat = feat + _conv(sd, "conv_after_body", body)

    lr = lambda t: F.leaky_relu(t, 0.2)
    if cfg.upsampler == "pixelshuffle":
        y = lr(_conv(sd, "conv_before_upsample.0", feat))
        for k in range(int(math.log2(cfg.scale))):
            y = F.pixel_shuffle(_conv(sd, f"upsample.{2 * k}", y), 2)
        out = _conv(sd, "conv_last", y)
    else:
        y = lr(_conv(sd, "conv_before_upsample.0", feat))
        y = lr(_conv(sd, "conv_up1",
                     F.interpolate(y, scale_factor=2, mode="nearest")))
        y = lr(_conv(sd, "conv_up2",
                     F.interpolate(y, scale_factor=2, mode="nearest")))
        out = _conv(sd, "conv_last", lr(_conv(sd, "conv_hr", y)))

    out = out / cfg.img_range + mean
    return out[:, :, :h * cfg.scale, :wd * cfg.scale]
