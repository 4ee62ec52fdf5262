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
           "pixel_unshuffle", "fuse_rrdbnet_params",
           "fuse_rrdbnet_params_s2d", "fuse_rrdbnet_params_dform",
           "fuse_rrdbnet_params_int8"]


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


def _rdb_fused_s2d(t: jax.Array, p: dict, gc: int) -> jax.Array:
    """_rdb_fused with the convs running in the rows-s2d Pallas kernel.

    t is a rows-s2d tensor (N, A, W, 2*nf). Identical math: the layout is
    exact (a pure row-interleave), the assembly slices just address both
    parity halves (kernels/rdb_pallas.py). Biases/adds stay f32 like the XLA
    path.
    """
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        rows_s2d_conv3x3)

    g = gc
    nf = t.shape[-1] // 2

    def sl(c, lo, hi):
        # rows-s2d slice of x-feature range [lo, hi) of a conv output whose
        # x-features per parity = width//2: channels oi*width + f.
        width = c.shape[-1] // 2
        return jnp.concatenate([c[..., lo:hi], c[..., width + lo:width + hi]],
                               axis=-1)

    def bias2(b):
        return jnp.concatenate([b, b]).astype(jnp.float32)

    b = p["b"]
    c0 = rows_s2d_conv3x3(t, p["wk0"])
    x1 = _lrelu(sl(c0, 0, g) + bias2(b[0:g])).astype(t.dtype)
    c1 = rows_s2d_conv3x3(x1, p["wk1"])
    x2 = _lrelu(sl(c0, g, 2 * g) + sl(c1, 0, g)
                + bias2(b[g:2 * g])).astype(t.dtype)
    c2 = rows_s2d_conv3x3(x2, p["wk2"])
    x3 = _lrelu(sl(c0, 2 * g, 3 * g) + sl(c1, g, 2 * g) + sl(c2, 0, g)
                + bias2(b[2 * g:3 * g])).astype(t.dtype)
    c3 = rows_s2d_conv3x3(x3, p["wk3"])
    x4 = _lrelu(sl(c0, 3 * g, 4 * g) + sl(c1, 2 * g, 3 * g)
                + sl(c2, g, 2 * g) + sl(c3, 0, g)
                + bias2(b[3 * g:4 * g])).astype(t.dtype)
    c4 = rows_s2d_conv3x3(x4, p["wk4"])
    x5 = (sl(c0, 4 * g, 4 * g + nf) + sl(c1, 3 * g, 3 * g + nf)
          + sl(c2, 2 * g, 2 * g + nf) + sl(c3, g, g + nf)
          + c4.astype(jnp.float32) + bias2(b[4 * g:]))
    return t + (0.2 * x5).astype(t.dtype)


def _rdb_fused_int8(x: jax.Array, p: dict, gc: int) -> jax.Array:
    """_rdb_fused with int8 MXU convs (opt-in fast mode, NOT exact).

    Round-3 envelope data (benchmarks/envelope_int8_shapes.py): int8 convs
    at the exact fused shapes run a FLOP-weighted 100.6 effective TOP/s vs
    bf16's 72.9 TF/s on v5e. Quantisation: per-output-channel symmetric
    weights (folded at fuse time), dynamic per-tensor activations
    (max-abs), int32 accumulation, dequant fused into the existing f32
    assembly — every add/lrelu/bias keeps the production numerics. Quality
    is a measured property, not an identity: see
    tests/test_quality.py::test_int8_trunk_quality (trained fixture) and
    the RESULTS.md study.
    """
    g = gc

    def conv_q(h, i):
        s_x = jnp.maximum(jnp.max(jnp.abs(h.astype(jnp.float32))), 1e-8)
        q = jnp.clip(jnp.round(h.astype(jnp.float32) * (127.0 / s_x)),
                     -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            q, p[f"w{i}_q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        scale = (s_x / 127.0) * p[f"w{i}_s"]          # (N,) f32
        return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    b = p["b"].astype(jnp.float32)
    c0 = conv_q(x, 0)
    x1 = _lrelu(c0[..., 0:g] + b[0:g])
    c1 = conv_q(x1, 1)
    x2 = _lrelu(c0[..., g:2 * g] + c1[..., 0:g] + b[g:2 * g])
    c2 = conv_q(x2, 2)
    x3 = _lrelu(c0[..., 2 * g:3 * g] + c1[..., g:2 * g] + c2[..., 0:g]
                + b[2 * g:3 * g])
    c3 = conv_q(x3, 3)
    x4 = _lrelu(c0[..., 3 * g:4 * g] + c1[..., 2 * g:3 * g]
                + c2[..., g:2 * g] + c3[..., 0:g] + b[3 * g:4 * g])
    c4 = conv_q(x4, 4)
    x5 = (c0[..., 4 * g:] + c1[..., 3 * g:] + c2[..., 2 * g:]
          + c3[..., g:] + c4 + b[4 * g:])
    return x + 0.2 * x5.astype(x.dtype)


def fuse_rrdbnet_params_int8(params: dict) -> dict:
    """fuse_rrdbnet_params + per-output-channel symmetric int8 trunk weights.

    Each fused conv weight (nb, 3, 3, Cin, N) f32 becomes w{i}_q int8 with
    scale w{i}_s = max|w| over (3, 3, Cin) per output channel / 127. The
    head and conv_first/conv_body stay bf16 (they are <6% of the FLOPs and
    the head feeds the final pixels).
    """
    fused = params if "w0" in params.get("body", {}).get("rdb1", {}) \
        else fuse_rrdbnet_params(params)
    body = {}
    for rdb, p in fused["body"].items():
        q = {"b": p["b"]}
        for i in range(5):
            w = np.asarray(p[f"w{i}"], np.float32)     # (nb, 3, 3, Cin, N)
            s = np.maximum(np.abs(w).max(axis=(1, 2, 3)), 1e-12) / 127.0
            q[f"w{i}_q"] = jnp.asarray(
                np.clip(np.round(w / s[:, None, None, None, :]),
                        -127, 127).astype(np.int8))
            q[f"w{i}_s"] = jnp.asarray(s.astype(np.float32))
        body[rdb] = q
    out = dict(fused)
    out["body"] = body
    return out


def _rrdb(x: jax.Array, p: dict, compute_dtype) -> jax.Array:
    if "w0_q" in p["rdb1"]:
        gc = p["rdb1"]["w1_q"].shape[2]  # Cin of conv1 == growth channels
        out = _rdb_fused_int8(x, p["rdb1"], gc)
        out = _rdb_fused_int8(out, p["rdb2"], gc)
        out = _rdb_fused_int8(out, p["rdb3"], gc)
    elif "wk0" in p["rdb1"]:
        gc = p["rdb1"]["wk1"].shape[0] // 12  # growth from rows-s2d layout
        out = _rdb_fused_s2d(x, p["rdb1"], gc)
        out = _rdb_fused_s2d(out, p["rdb2"], gc)
        out = _rdb_fused_s2d(out, p["rdb3"], gc)
    elif "w0" in p["rdb1"]:
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
    return fold_head_params(out)


def fuse_rrdbnet_params_s2d(params: dict) -> dict:
    """fuse_rrdbnet_params + re-lay every trunk conv for the rows-s2d Pallas
    kernel (kernels/rdb_pallas.py): w (3,3,Cin,Cout) -> wk (12*Cin, 2*Cout).

    Exact reparameterisation (pure index shuffle + structured zeros). The
    non-trunk convs (conv_first, upsampling head) stay HWIO for XLA.
    """
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        rearrange_w_rows_s2d)

    fused = fuse_rrdbnet_params(params) if "w0" not in params["body"]["rdb1"] \
        else params

    def rearrange_stacked(w):
        w = np.asarray(w)                      # (nb, 3, 3, cin, cout)
        return jnp.asarray(np.stack([rearrange_w_rows_s2d(w[i])
                                     for i in range(w.shape[0])]))

    body = {}
    for rdb, p in fused["body"].items():
        body[rdb] = {"b": p["b"]}
        for i in range(5):
            body[rdb][f"wk{i}"] = rearrange_stacked(p[f"w{i}"])
    out = dict(fused)
    out["body"] = body
    out["conv_body_wk"] = jnp.asarray(
        rearrange_w_rows_s2d(np.asarray(fused["conv_body"]["w"])))
    return out


def fuse_rrdbnet_params_dform(params: dict) -> dict:
    """fuse_rrdbnet_params + re-lay the trunk for the fused whole-RDB Pallas
    kernel (kernels/rdb_dform.py): per RDB, five D-form weight tensors
    (3, 4*Cin, 2*Nslab) with slab-blocked parity-paired N, stacked over the
    num_block axis for lax.scan. Exact reparameterisation (index shuffle +
    structured zeros); the head and conv_first/conv_body stay HWIO for XLA.
    """
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        dform_rdb_weights)

    fused = params if "w0" in params.get("body", {}).get("rdb1", {}) \
        else fuse_rrdbnet_params(params)
    body = {}
    for rdb, p in fused["body"].items():
        nb = p["w0"].shape[0]
        per_block = [dform_rdb_weights(
            {k: np.asarray(v[i]) for k, v in p.items()})
            for i in range(nb)]
        body[rdb] = {k: jnp.stack([pb[k] for pb in per_block])
                     for k in per_block[0]}
    out = dict(fused)
    out["body_dform"] = body
    return out


def _trunk_dform(params: dict, feat: jax.Array, cfg: RRDBNetConfig,
                 cdt) -> jax.Array:
    """23-block trunk through the fused whole-RDB kernel.

    feat: (N, H, W, nf) -> same shape; includes the trunk conv_body residual.
    """
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        from_dform, rdb_dform_call, to_dform)
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        from_rows_s2d, to_rows_s2d)

    import os as _os

    t = to_rows_s2d(feat.astype(jnp.bfloat16))
    a, w = t.shape[1], t.shape[2]
    xf = to_dform(t)
    # "v2" (default): K-concat bf16-output dots (round-3 retry);
    # "v1": round-2 shifted f32 dots — kept for A/B measurement.
    variant = _os.environ.get("NESR_DFORM_VARIANT", "v2")

    def body_step(h, bp):
        # basicsr RRDB: out = x + 0.2 * rdb3(rdb2(rdb1(x))) — each inner
        # rdb already contains its own residual (the kernel returns
        # x + 0.2*x5). Residual add in bf16, matching _rrdb.
        h1 = rdb_dform_call(h, bp["rdb1"], a, w, variant=variant)
        h1 = rdb_dform_call(h1, bp["rdb2"], a, w, variant=variant)
        h1 = rdb_dform_call(h1, bp["rdb3"], a, w, variant=variant)
        return h + 0.2 * h1, None

    body_out, _ = lax.scan(body_step, xf, params["body_dform"])
    body_feat = from_rows_s2d(from_dform(body_out, a, w))
    feat = feat + _conv3x3(body_feat, params["conv_body"], cdt)
    return feat


def _nearest_x2(x: jax.Array) -> jax.Array:
    """torch F.interpolate(scale_factor=2, mode='nearest') in NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# Folded upsampling head.
#
# The reference head (basicsr RRDBNet.forward) runs conv3x3(nearest_x2(...))
# twice, then conv_hr/conv_last — all 64-wide convs at 2x/4x resolution,
# which measure only 14-17 TF/s on v5e (narrow channels + huge spatial).
# Exact reparameterisations move every head conv into an MXU-friendly shape:
#
#  * conv3x3 o nearest_x2 == one 3x3 conv C -> 4D at the LOW resolution whose
#    output channels are the 2x image in space-to-depth order (nearest
#    duplication folds into per-subpixel sums of kernel taps): 49 TF/s.
#  * conv_hr / conv_last run on that s2d form as a pair of 2x2 convs over
#    4C channels (kernel index di = 2ki+pi-oi; frame shifts cancel across the
#    pair, padding (1,1)+VALID restores SAME semantics): 49 TF/s raw.
#
# All folds are weight pre-sums / index shuffles in f32 — bit-exact modulo
# bf16 rounding order. Measured +13% end-to-end (benchmarks/RESULTS.md).
# ---------------------------------------------------------------------------


def fold_upconv_weights(w, b) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(3,3,C,D) + (D,) -> (3,3,C,4D) + (4D,): conv3x3 o nearest_x2 fold.

    Output channel (oi*2+oj)*D + f holds the 2x-res output at subpixel
    (oi, oj); per subpixel, nearest duplication collapses kernel taps:
    oi=0: rows {W[0] | W[1]+W[2]}, oi=1: {W[0]+W[1] | W[2]} (cols same).
    """
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    c, d = w.shape[2], w.shape[3]
    rowmaps = {0: {0: [0], 1: [1, 2]}, 1: {1: [0, 1], 2: [2]}}
    out = np.zeros((3, 3, c, 4 * d), np.float32)
    for oi in range(2):
        for oj in range(2):
            sub = np.zeros((3, 3, c, d), np.float32)
            for drp, srcs_r in rowmaps[oi].items():
                for dcp, srcs_c in rowmaps[oj].items():
                    for dr in srcs_r:
                        for dc in srcs_c:
                            sub[drp, dcp] += w[dr, dc]
            out[..., (oi * 2 + oj) * d:(oi * 2 + oj + 1) * d] = sub
    return jnp.asarray(out), jnp.asarray(np.tile(b, 4))


def fold_s2d2x2_weights(w, b) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(3,3,C,D) + (D,) -> (2,2,4C,4D) + (4D,): 3x3 conv on the space-to-
    depth form (channel (pi*2+pj)*C + c). Kernel tap (ki,kj) contributes
    w[di,dj] with di = 2ki+pi-oi (dj likewise) when within 0..2.

    Applied with padding (1,1) the output gains one row/col and covers
    x-positions -1..H (a half-pixel frame shift); a second fold applied
    VALID consumes that frame and restores alignment (see _head_forward).
    """
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    c, d = w.shape[2], w.shape[3]
    out = np.zeros((2, 2, 4 * c, 4 * d), np.float32)
    for ki in range(2):
        for kj in range(2):
            for pi in range(2):
                for pj in range(2):
                    for oi in range(2):
                        for oj in range(2):
                            di, dj = 2 * ki + pi - oi, 2 * kj + pj - oj
                            if 0 <= di <= 2 and 0 <= dj <= 2:
                                ci = (pi * 2 + pj) * c
                                co = (oi * 2 + oj) * d
                                out[ki, kj, ci:ci + c, co:co + d] = w[di, dj]
    return jnp.asarray(out), jnp.asarray(np.tile(b, 4))


def _d2s(z: jax.Array) -> jax.Array:
    """(N,H,W,4C) subpixel-major -> (N,2H,2W,C) depth-to-space."""
    n, h, w, c4 = z.shape
    c = c4 // 4
    z = z.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, 2 * h, 2 * w, c)


def fold_head_params(params: dict) -> dict:
    """Attach the folded upsampling-head weights (see module comment)."""
    out = dict(params)
    out["up1_fold"] = dict(zip(("w", "b"), fold_upconv_weights(
        params["conv_up1"]["w"], params["conv_up1"]["b"])))
    out["up2_fold"] = dict(zip(("w", "b"), fold_upconv_weights(
        params["conv_up2"]["w"], params["conv_up2"]["b"])))
    out["hr_fold"] = dict(zip(("w", "b"), fold_s2d2x2_weights(
        params["conv_hr"]["w"], params["conv_hr"]["b"])))
    out["last_fold"] = dict(zip(("w", "b"), fold_s2d2x2_weights(
        params["conv_last"]["w"], params["conv_last"]["b"])))
    return out


def _conv(x, w, b, cdt, padding, kdims=("NHWC", "HWIO", "NHWC")):
    y = lax.conv_general_dilated(
        x.astype(cdt), w.astype(cdt), (1, 1), padding,
        dimension_numbers=kdims, preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(cdt)


def _frame_border_mask(h: jax.Array) -> jax.Array:
    """Zero the half-pixel-frame border entries of an A-form conv output.

    A-form rows r cover x-rows 2r-1+oi in [-1, 2H]; x-rows -1 and 2H are
    outside the true image, where the following SAME conv must see zeros —
    but the A conv computes extended values there. Masks are built from
    iotas inside the trace (a materialised constant at these shapes would
    embed GBs into the HLO); XLA fuses the multiply into the conv epilogue.
    """
    n, rp1, sp1, c4 = h.shape
    d = c4 // 4
    ri = jnp.arange(rp1)
    rm = jnp.stack([ri != 0, ri != rp1 - 1], axis=-1)        # (rp1, 2) per oi
    ci = jnp.arange(sp1)
    cm = jnp.stack([ci != 0, ci != sp1 - 1], axis=-1)        # (sp1, 2) per oj
    h5 = h.reshape(n, rp1, sp1, 4, d)
    keep = (rm[:, None, :, None] & cm[None, :, None, :]).reshape(
        1, rp1, sp1, 4, 1)
    return jnp.where(keep, h5, jnp.zeros((), h.dtype)).reshape(h.shape)


def _head_forward(feat: jax.Array, params: dict, cdt) -> jax.Array:
    """Folded upsampling head: feat (N,H,W,64) -> (N,4H,4W,num_out_ch)."""
    z = _lrelu(_conv(feat, params["up1_fold"]["w"], params["up1_fold"]["b"],
                     cdt, "SAME"))                       # (N,H,W,256) = 2x
    y1 = _d2s(z)                                         # (N,2H,2W,64)
    z2 = _lrelu(_conv(y1, params["up2_fold"]["w"], params["up2_fold"]["b"],
                      cdt, "SAME"))                      # (N,2H,2W,256) = 4x s2d
    h = _conv(z2, params["hr_fold"]["w"], params["hr_fold"]["b"],
              cdt, ((1, 1), (1, 1)))                     # frame -1, +1 row/col
    h = _frame_border_mask(_lrelu(h))
    o = _conv(h, params["last_fold"]["w"], params["last_fold"]["b"],
              cdt, "VALID")                              # frame restored
    return _d2s(o)                                       # (N,4H,4W,out)


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

    dform = "body_dform" in params and feat.shape[1] % 2 == 0 \
        and cdt == jnp.bfloat16
    s2d = not dform and "conv_body_wk" in params and feat.shape[1] % 2 == 0
    if dform:
        # fused whole-RDB Pallas trunk (kernels/rdb_dform.py); shares the
        # upsampling head below with the other trunk variants.
        feat = _trunk_dform(params, feat, cfg, cdt)
    elif s2d:
        # rows-s2d trunk: the 23-block scan and conv_body run in the Pallas
        # patch-matmul layout (kernels/rdb_pallas.py); one transpose each way.
        from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
            from_rows_s2d, rows_s2d_conv3x3, to_rows_s2d)
        feat_t = to_rows_s2d(feat.astype(cdt))

        def body_step(h, block_params):
            return _rrdb(h, block_params, cdt), None

        body_out, _ = lax.scan(body_step, feat_t, params["body"],
                               unroll=min(unroll, cfg.num_block))
        body_conv = rows_s2d_conv3x3(body_out, params["conv_body_wk"])
        body_conv = (body_conv.astype(jnp.float32)
                     + jnp.concatenate([params["conv_body"]["b"]] * 2
                                       ).astype(jnp.float32)).astype(cdt)
        feat = feat + from_rows_s2d(body_conv).astype(feat.dtype)
    else:
        def body_step(h, block_params):
            return _rrdb(h, block_params, cdt), None

        body_out, _ = lax.scan(body_step, feat, params["body"],
                               unroll=min(unroll, cfg.num_block))
        feat = feat + _conv3x3(body_out, params["conv_body"], cdt)

    if "up1_fold" in params:
        return _head_forward(feat, params, cdt).astype(jnp.float32)
    feat = _lrelu(_conv3x3(_nearest_x2(feat), params["conv_up1"], cdt))
    feat = _lrelu(_conv3x3(_nearest_x2(feat), params["conv_up2"], cdt))
    out = _conv3x3(_lrelu(_conv3x3(feat, params["conv_hr"], cdt)),
                   params["conv_last"], cdt)
    return out.astype(jnp.float32)
