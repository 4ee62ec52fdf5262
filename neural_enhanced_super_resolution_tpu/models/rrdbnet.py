"""RRDBNet (Real-ESRGAN backbone) — TPU-native JAX implementation.

Functionally equivalent to the architecture the reference constructs via
``basicsr.archs.rrdbnet_arch.RRDBNet`` (/root/reference/nesr/nesr.py:216:
num_in_ch=12, num_out_ch=3, num_feat=64, num_block=23, num_grow_ch=32 — the
"12-channel quirk", scale=4 with no pixel-unshuffle) and the standard 3-channel
x2plus form (scale=2 with pixel-unshuffle,
/root/reference/standalone/direct_esrgan.py:104).

TPU-first design decisions:
  * NHWC layout throughout (XLA's preferred conv layout on TPU; channels ride
    the 128-wide lane dimension of the MXU).
  * The 23 identical RRDB blocks are stacked on a leading axis and driven by
    ``lax.scan`` — one compiled block body instead of 345 unrolled convs,
    keeping compile times low and the jit cache warm across tile shapes.
  * A precision policy: params stay f32; compute runs in bf16 (MXU native) or
    f32 (bit-parity mode) with f32 accumulation via preferred_element_type.
  * Residual adds stay in f32 to avoid bf16 drift across 23 blocks.

Weight conversion from the reference's ``RealESRGAN_x2plus.pth`` checkpoints
lives in models/weights.py.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["RRDBNetConfig", "init_rrdbnet", "rrdbnet_forward",
           "pixel_unshuffle", "fuse_rrdbnet_params"]


class RRDBNetConfig:
    """Static architecture hyperparameters (hashable, usable as a jit static)."""

    def __init__(self, num_in_ch: int = 3, num_out_ch: int = 3, scale: int = 4,
                 num_feat: int = 64, num_block: int = 23, num_grow_ch: int = 32):
        if scale not in (1, 2, 4):
            raise ValueError(f"scale must be 1, 2 or 4, got {scale}")
        self.num_in_ch = num_in_ch
        self.num_out_ch = num_out_ch
        self.scale = scale
        self.num_feat = num_feat
        self.num_block = num_block
        self.num_grow_ch = num_grow_ch

    @property
    def conv_first_in_ch(self) -> int:
        # basicsr: scale==2 -> pixel_unshuffle(2) quadruples channels,
        # scale==1 -> unshuffle(4) -> 16x. scale==4 feeds the input directly.
        if self.scale == 2:
            return self.num_in_ch * 4
        if self.scale == 1:
            return self.num_in_ch * 16
        return self.num_in_ch

    def _key(self):
        return (self.num_in_ch, self.num_out_ch, self.scale, self.num_feat,
                self.num_block, self.num_grow_ch)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, RRDBNetConfig) and self._key() == other._key()

    def __repr__(self):
        return f"RRDBNetConfig{self._key()}"


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-unshuffle with torch channel ordering (c*r*r + ry*r + rx)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (n, h/r, w/r, c, ry, rx)
    return x.reshape(n, h // r, w // r, c * r * r)


def _conv_init(key, kh, kw, cin, cout):
    # Kaiming-uniform fan_in (torch Conv2d default), adequate for random-weight
    # tests; real use loads converted reference checkpoints.
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32,
                           -bound * np.sqrt(3.0), bound * np.sqrt(3.0))
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_rrdbnet(key: jax.Array, cfg: RRDBNetConfig) -> dict[str, Any]:
    """Random-initialised parameter pytree (body stacked on a leading axis)."""
    nf, gc, nb = cfg.num_feat, cfg.num_grow_ch, cfg.num_block
    keys = iter(jax.random.split(key, 8 + nb * 15))
    params: dict[str, Any] = {
        "conv_first": _conv_init(next(keys), 3, 3, cfg.conv_first_in_ch, nf),
        "conv_body": _conv_init(next(keys), 3, 3, nf, nf),
        "conv_up1": _conv_init(next(keys), 3, 3, nf, nf),
        "conv_up2": _conv_init(next(keys), 3, 3, nf, nf),
        "conv_hr": _conv_init(next(keys), 3, 3, nf, nf),
        "conv_last": _conv_init(next(keys), 3, 3, nf, cfg.num_out_ch),
    }
    # Stack the 23 RRDB blocks: body[rdb][conv] arrays get leading dim nb.
    body: dict[str, Any] = {}
    for rdb in ("rdb1", "rdb2", "rdb3"):
        convs = {}
        for ci in range(1, 6):
            cin = nf + (ci - 1) * gc
            cout = gc if ci < 5 else nf
            stacked = [_conv_init(next(keys), 3, 3, cin, cout)
                       for _ in range(nb)]
            convs[f"conv{ci}"] = {
                "w": jnp.stack([s["w"] for s in stacked]),
                "b": jnp.stack([s["b"] for s in stacked]),
            }
        body[rdb] = convs
    params["body"] = body
    return params


def _conv3x3(x: jax.Array, p: dict, compute_dtype) -> jax.Array:
    """3x3 SAME conv: MXU accumulates in f32, activations stay in
    compute_dtype (bf16) so HBM traffic between convs is halved."""
    w = p["w"].astype(compute_dtype)
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(compute_dtype)


def _lrelu(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(x: jax.Array, p: dict, compute_dtype) -> jax.Array:
    """Residual Dense Block: 5 densely connected convs + 0.2-scaled residual."""
    x1 = _lrelu(_conv3x3(x, p["conv1"], compute_dtype))
    c = jnp.concatenate([x, x1], axis=-1)
    x2 = _lrelu(_conv3x3(c, p["conv2"], compute_dtype))
    c = jnp.concatenate([c, x2], axis=-1)
    x3 = _lrelu(_conv3x3(c, p["conv3"], compute_dtype))
    c = jnp.concatenate([c, x3], axis=-1)
    x4 = _lrelu(_conv3x3(c, p["conv4"], compute_dtype))
    c = jnp.concatenate([c, x4], axis=-1)
    x5 = _conv3x3(c, p["conv5"], compute_dtype)
    return x + 0.2 * x5


def _conv3x3_f32(x: jax.Array, w: jax.Array, compute_dtype) -> jax.Array:
    """Bias-free 3x3 conv returning the f32 MXU accumulator (fused path)."""
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y


def _rdb_fused(x: jax.Array, p: dict, gc: int, compute_dtype) -> jax.Array:
    """MXU-shaped RDB: identical math to _rdb, restructured for the TPU.

    A dense-block conv over concat([x, x1, ..., xk]) equals the sum of convs
    over the segments. Grouping by SOURCE instead of by destination turns the
    five narrow convs (out=32) into five wide ones (out=192/160/128/96/64 for
    the stock 64/32 configuration) — the MXU's lane dimension goes from 25%
    to >=50% occupied, with zero extra FLOPs and no concat materialisation.
    Measured ~2x on v5e (see bench history). Weight layout comes from
    fuse_rrdbnet_params(); assembly adds run in f32.
    """
    g = gc
    c0 = _conv3x3_f32(x, p["w0"], compute_dtype).astype(compute_dtype)
    b = p["b"].astype(jnp.float32)                           # (4*g + nf,)
    x1 = _lrelu(c0[..., 0:g] + b[0:g])
    c1 = _conv3x3_f32(x1, p["w1"], compute_dtype).astype(compute_dtype)
    x2 = _lrelu(c0[..., g:2 * g] + c1[..., 0:g] + b[g:2 * g])
    c2 = _conv3x3_f32(x2, p["w2"], compute_dtype).astype(compute_dtype)
    x3 = _lrelu(c0[..., 2 * g:3 * g] + c1[..., g:2 * g] + c2[..., 0:g]
                + b[2 * g:3 * g])
    c3 = _conv3x3_f32(x3, p["w3"], compute_dtype).astype(compute_dtype)
    x4 = _lrelu(c0[..., 3 * g:4 * g] + c1[..., 2 * g:3 * g]
                + c2[..., g:2 * g] + c3[..., 0:g] + b[3 * g:4 * g])
    c4 = _conv3x3_f32(x4, p["w4"], compute_dtype).astype(compute_dtype)
    x5 = (c0[..., 4 * g:] + c1[..., 3 * g:] + c2[..., 2 * g:]
          + c3[..., g:] + c4 + b[4 * g:])
    return x + 0.2 * x5.astype(x.dtype)


def _rrdb(x: jax.Array, p: dict, compute_dtype) -> jax.Array:
    if "w0" in p["rdb1"]:
        gc = p["rdb1"]["w1"].shape[2]  # growth channels from fused layout
        out = _rdb_fused(x, p["rdb1"], gc, compute_dtype)
        out = _rdb_fused(out, p["rdb2"], gc, compute_dtype)
        out = _rdb_fused(out, p["rdb3"], gc, compute_dtype)
    else:
        out = _rdb(x, p["rdb1"], compute_dtype)
        out = _rdb(out, p["rdb2"], compute_dtype)
        out = _rdb(out, p["rdb3"], compute_dtype)
    return x + 0.2 * out


def fuse_rrdbnet_params(params: dict) -> dict:
    """Re-lay the RDB weights source-major for the MXU (see _rdb_fused).

    Exact reparameterisation: conv_k(concat(segments)) == sum_s conv_s with
    the per-source slabs stacked on the output axis. Works on the stacked
    (num_block, ...) body layout; non-body convs pass through unchanged.
    """
    body = params["body"]
    nf = body["rdb1"]["conv1"]["w"].shape[-2]   # (nb, 3, 3, nf, gc)
    gc = body["rdb1"]["conv1"]["w"].shape[-1]

    def fuse_rdb(p):
        w = {k: p[f"conv{i}"]["w"] for i, k in
             enumerate(("c1", "c2", "c3", "c4", "c5"), 1)}
        seg = lambda arr, s: arr[..., nf + (s - 1) * gc: nf + s * gc, :]
        w0 = jnp.concatenate([w["c1"],
                              w["c2"][..., :nf, :], w["c3"][..., :nf, :],
                              w["c4"][..., :nf, :], w["c5"][..., :nf, :]],
                             axis=-1)
        w1 = jnp.concatenate([seg(w["c2"], 1), seg(w["c3"], 1),
                              seg(w["c4"], 1), seg(w["c5"], 1)], axis=-1)
        w2 = jnp.concatenate([seg(w["c3"], 2), seg(w["c4"], 2),
                              seg(w["c5"], 2)], axis=-1)
        w3 = jnp.concatenate([seg(w["c4"], 3), seg(w["c5"], 3)], axis=-1)
        w4 = seg(w["c5"], 4)
        b = jnp.concatenate([p[f"conv{i}"]["b"] for i in range(1, 6)],
                            axis=-1)
        return {"w0": w0, "w1": w1, "w2": w2, "w3": w3, "w4": w4, "b": b}

    fused_body = {rdb: fuse_rdb(body[rdb]) for rdb in ("rdb1", "rdb2",
                                                       "rdb3")}
    out = dict(params)
    out["body"] = fused_body
    return out


def _nearest_x2(x: jax.Array) -> jax.Array:
    """torch F.interpolate(scale_factor=2, mode='nearest') in NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "unroll"))
def rrdbnet_forward(params: dict, x: jax.Array, cfg: RRDBNetConfig,
                    compute_dtype: str = "bfloat16",
                    unroll: int = 1) -> jax.Array:
    """Forward pass. x: (N, H, W, num_in_ch) float32 in [0, 1].

    Returns (N, H*scale, W*scale, num_out_ch) float32.
    """
    cdt = jnp.dtype(compute_dtype)
    if cfg.scale == 2:
        x = pixel_unshuffle(x, 2)
    elif cfg.scale == 1:
        x = pixel_unshuffle(x, 4)

    feat = _conv3x3(x, params["conv_first"], cdt)

    def body_step(h, block_params):
        return _rrdb(h, block_params, cdt), None

    body_out, _ = lax.scan(body_step, feat, params["body"],
                           unroll=min(unroll, cfg.num_block))
    feat = feat + _conv3x3(body_out, params["conv_body"], cdt)

    feat = _lrelu(_conv3x3(_nearest_x2(feat), params["conv_up1"], cdt))
    feat = _lrelu(_conv3x3(_nearest_x2(feat), params["conv_up2"], cdt))
    out = _conv3x3(_lrelu(_conv3x3(feat, params["conv_hr"], cdt)),
                   params["conv_last"], cdt)
    return out.astype(jnp.float32)
