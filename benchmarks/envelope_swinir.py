#!/usr/bin/env python3
"""Where does the SwinIR forward actually spend its time? (round-4 item 4)

Measured round 3: full-size SwinIR-M x4 runs ~111 ms on a 192^2 input at
batch 1 on one v5e (~10.6 TF/s, ~5% MFU).  The linears (qkv/proj/mlp) are
~92% of the FLOPs and should individually run far better than 5% MFU, so
the time must be going somewhere else: the tiny batched attention einsums
(64x30x64 / 64x64x30 — K or N far below the 128-lane MXU tile), the f32
scores/softmax traffic (the (bn, 6, 64, 64) scores tensor is LARGER than
the activation tensor), the f32 LayerNorms, or the per-layer window
partition/merge transposes and shift rolls.

This probe measures ablated variants of the real forward (same config,
random weights — perf only) and reports each component's share by
difference.  Variants:

  full          exact production forward (swinir_forward semantics, inlined)
  attn_id       scores/softmax/av replaced by identity (o = v); keeps
                qkv+proj linears, LN, layout, rolls, MLP
  no_layout     window partition/merge replaced by a flat reshape
                (b*h*w/n, n, c) — same einsum shapes, no 6-D transposes
  no_shift      shift rolls + masks dropped (every layer unshifted)
  no_ln         norm1/norm2 skipped (raw residual input into sublayers)
  no_mlp        MLP sublayer skipped
  linears_only  attention core AND LN AND layout dropped — qkv/proj/mlp
                matmul chain only (upper bound for 'XLA matmuls at these
                shapes')

Timing: per-call best-of-N with scalar fetch (111 ms of real work per call
dwarfs the ~30 ms tunnel round-trip; slope not needed at this magnitude).

Run ON TPU: python benchmarks/envelope_swinir.py [H W BATCH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NESR_COMPILE_CACHE_DIR",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "nesr-jax"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.models.swinir import (
    SwinIRConfig, init_swinir, _ln, _lin, _conv3, _relative_position_index,
    _shift_attn_mask, _pixel_shuffle, _lrelu, _RGB_MEAN)

H = int(sys.argv[1]) if len(sys.argv) > 1 else 192
W = int(sys.argv[2]) if len(sys.argv) > 2 else 192
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 1


def _lin_b(x, p, name, cdt):
    """bf16-output linear: f32 MXU accumulation, one rounding at the dot
    output, bf16 bias add (vs _lin's f32 output + f32 bias)."""
    y = jnp.einsum("...i,io->...o", x.astype(cdt), p[f"{name}.weight"].astype(cdt),
                   preferred_element_type=cdt)
    return y + p[f"{name}.bias"].astype(cdt)


def forward(params, x, cfg, variant):
    """Inlined swinir_forward with ablation switches (H, W window-aligned)."""
    cdt = jnp.dtype(jnp.bfloat16)
    b, h, w, _ = x.shape
    ws = cfg.window_size
    n = ws * ws
    mean = jnp.asarray(_RGB_MEAN)
    x = (x - mean) * cfg.img_range
    feat = _conv3(x, params, "conv_first", cdt)

    layout = variant not in ("no_layout", "linears_only")
    use_ln = variant not in ("no_ln", "linears_only")
    use_attn = variant not in ("attn_id", "linears_only")
    use_shift = variant not in ("no_shift", "no_layout", "linears_only")
    use_mlp = variant != "no_mlp"
    # dtype/layout experiments
    lin_bf16 = variant in ("lin_bf16", "attn_v2", "all_v2")
    attn_v2 = variant in ("attn_v2", "all_v2")   # no-transpose qkv + bf16 scores
    lin = _lin_b if lin_bf16 else _lin

    body = feat
    for li, depth in enumerate(cfg.depths):
        gin = body
        for bi in range(depth):
            base = f"layers.{li}.residual_group.blocks.{bi}"
            shift = (ws // 2) if (bi % 2 and use_shift) else 0
            heads = cfg.num_heads[li]
            c = cfg.embed_dim

            idx = _relative_position_index(ws)
            table = params[f"{base}.attn.relative_position_bias_table"]
            bias_t = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, heads)
            bias_t = bias_t.transpose(2, 0, 1).astype(jnp.float32)

            xx = body
            shortcut = xx
            y = _ln(xx, params, f"{base}.norm1", cdt) if use_ln else xx
            mask = None
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
                mask = _shift_attn_mask(h, w, ws, shift)
            if layout:
                yw = y.reshape(b, h // ws, ws, w // ws, ws, c)
                yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, c)
            else:
                yw = y.reshape(-1, n, c)

            bn = yw.shape[0]
            hd = c // heads
            qkv = lin(yw, params, f"{base}.attn.qkv", cdt)
            if attn_v2:
                # head split without the 5-D transpose: einsum contracts
                # over hd with heads as a free batch dim in place.
                qkv = qkv.reshape(bn, n, 3, heads, hd)
                q = qkv[:, :, 0] * (hd ** -0.5)
                k = qkv[:, :, 1]
                v = qkv[:, :, 2]                       # (bn, n, heads, hd)
                if use_attn:
                    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(cdt),
                                   k.astype(cdt), preferred_element_type=cdt)
                    s = s.astype(jnp.float32) + bias_t[None]
                    if mask is not None:
                        nw = mask.shape[0]
                        s = s.reshape(bn // nw, nw, heads, n, n) + \
                            jnp.asarray(mask)[None, :, None]
                        s = s.reshape(bn, heads, n, n)
                    a = jax.nn.softmax(s, axis=-1).astype(cdt)
                    o = jnp.einsum("bhnm,bmhd->bnhd", a, v.astype(cdt),
                                   preferred_element_type=cdt)
                else:
                    o = v
                o = o.reshape(bn, n, c).astype(cdt)
            else:
                qkv = qkv.reshape(bn, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                if use_attn:
                    s = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                                   preferred_element_type=jnp.float32)
                    s = s + bias_t[None]
                    if mask is not None:
                        nw = mask.shape[0]
                        s = s.reshape(bn // nw, nw, heads, n, n) + \
                            jnp.asarray(mask)[None, :, None]
                        s = s.reshape(bn, heads, n, n)
                    a = jax.nn.softmax(s, axis=-1).astype(cdt)
                    o = jnp.einsum("bhnm,bhmd->bhnd", a, v.astype(cdt),
                                   preferred_element_type=jnp.float32)
                else:
                    o = v.astype(jnp.float32)
                o = o.transpose(0, 2, 1, 3).reshape(bn, n, c).astype(cdt)
            ow = lin(o, params, f"{base}.attn.proj", cdt)

            if layout:
                oo = ow.reshape(b, h // ws, w // ws, ws, ws, c)
                oo = oo.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            else:
                oo = ow.reshape(b, h, w, c)
            if shift:
                oo = jnp.roll(oo, (shift, shift), axis=(1, 2))
            xx = (shortcut.astype(jnp.float32)
                  + oo.astype(jnp.float32)).astype(cdt)

            if use_mlp:
                y = _ln(xx, params, f"{base}.norm2", cdt) if use_ln else xx
                y = lin(y, params, f"{base}.mlp.fc1", cdt)
                y = jax.nn.gelu(y.astype(jnp.float32),
                                approximate=False).astype(cdt)
                y = lin(y, params, f"{base}.mlp.fc2", cdt)
                xx = (xx.astype(jnp.float32)
                      + y.astype(jnp.float32)).astype(cdt)
            body = xx
        body = _conv3(body, params, f"layers.{li}.conv", cdt)
        body = (body.astype(jnp.float32) + gin.astype(jnp.float32)).astype(cdt)

    body = _ln(body, params, "norm", cdt)
    feat = (feat.astype(jnp.float32)
            + _conv3(body, params, "conv_after_body", cdt)
            .astype(jnp.float32)).astype(cdt)
    y = _lrelu(_conv3(feat, params, "conv_before_upsample.0", cdt))
    for kk in range(2):
        y = _conv3(y, params, f"upsample.{2 * kk}", cdt)
        y = _pixel_shuffle(y, 2)
    out = _conv3(y, params, "conv_last", cdt)
    return out.astype(jnp.float32) / cfg.img_range + mean


def main():
    cfg = SwinIRConfig(scale=4, embed_dim=180, depths=(6,) * 6,
                      num_heads=(6,) * 6, window_size=8, mlp_ratio=2.0,
                      upsampler="pixelshuffle")
    params = init_swinir(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, H, W, 3), np.float32))

    variants = ["full", "lin_bf16", "attn_v2", "all_v2", "attn_id",
                "linears_only"]
    times = {}
    for vname in variants:
        fn = jax.jit(lambda p, xx, v=vname: forward(p, xx, cfg, v))
        t0 = time.time()
        float(jnp.sum(fn(params, x)))       # compile + run
        print(f"{vname:13s} compile+first {time.time() - t0:7.1f} s",
              flush=True)
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            float(jnp.sum(fn(params, x)))
            best = min(best, time.time() - t0)
        times[vname] = best
        print(f"{vname:13s} best-of-8 {best * 1e3:8.1f} ms", flush=True)

    full = times["full"]
    print()
    print(f"input {BATCH}x{H}x{W}  full = {full * 1e3:.1f} ms "
          f"({BATCH * H * W * 16 / 1e6 / full:.2f} MP_out/s)")
    for vname in variants[1:]:
        d = full - times[vname]
        print(f"  {vname:13s} {times[vname] * 1e3:8.1f} ms   "
              f"component share {d * 1e3:7.1f} ms ({100 * d / full:5.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
