#!/usr/bin/env python3
"""Where do the other 5.8 ms/RDB go? The fixed per-shape envelope
(envelope_int8_shapes.py, max|y| consumer) shows the five fused-RDB convs
cost ~8.7 ms in isolation, yet the production trunk runs 14.5 ms/RDB.
Suspect: the f32 conv outputs materialise to HBM before the bf16 casts and
slab-assembly adds (c0..c4 total 3.4 GB f32 + 1.7 GB bf16 per RDB).

Variants timed (full RDB chain, slope method over scan of 23 blocks):

  base     — production _rdb_fused (f32 conv out -> astype(bf16) -> adds)
  pbf16    — convs with preferred_element_type=bfloat16 (XLA picks the
             accumulation; numerics checked separately)
  f32asm   — no casts: assembly consumes the f32 conv outputs directly
             (more f32 read traffic but no separate convert pass)
  convonly — the five convs with a max-consumer, no assembly (lower bound)

Run ON TPU: python benchmarks/envelope_trunk_variants.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb_base(x, p, g):
    conv = lambda h, w: _conv(h, w, jnp.float32).astype(jnp.bfloat16)
    b = p["b"].astype(jnp.float32)
    c0 = conv(x, p["w0"])
    x1 = _lrelu(c0[..., 0:g] + b[0:g]).astype(jnp.bfloat16)
    c1 = conv(x1, p["w1"])
    x2 = _lrelu(c0[..., g:2 * g] + c1[..., 0:g] + b[g:2 * g]
                ).astype(jnp.bfloat16)
    c2 = conv(x2, p["w2"])
    x3 = _lrelu(c0[..., 2 * g:3 * g] + c1[..., g:2 * g] + c2[..., 0:g]
                + b[2 * g:3 * g]).astype(jnp.bfloat16)
    c3 = conv(x3, p["w3"])
    x4 = _lrelu(c0[..., 3 * g:4 * g] + c1[..., 2 * g:3 * g]
                + c2[..., g:2 * g] + c3[..., 0:g]
                + b[3 * g:4 * g]).astype(jnp.bfloat16)
    c4 = conv(x4, p["w4"])
    x5 = (c0[..., 4 * g:] + c1[..., 3 * g:] + c2[..., 2 * g:]
          + c3[..., g:] + c4 + b[4 * g:])
    return x + 0.2 * x5.astype(x.dtype)


def rdb_variant(x, p, g, variant):
    b = p["b"].astype(jnp.float32)
    if variant == "convonly":
        m = jnp.float32(0)
        h = x
        for i, key in enumerate(("w0", "w1", "w2", "w3", "w4")):
            cin = 64 if i == 0 else 32
            y = _conv(h[..., :cin], p[key], jnp.float32)
            m = jnp.maximum(m, jnp.max(jnp.abs(y)))
            h = y[..., :64].astype(jnp.bfloat16)  # keep a data dependence
        return (x.astype(jnp.float32) + 0.0 * m).astype(x.dtype)

    # Variants differ ONLY in how the conv output reaches the (identical)
    # bf16-slab assembly below — this isolates the convert/materialise cost.
    if variant == "pbf16":
        # conv emits bf16 directly: no separate convert pass, assembly
        # reads 1.7 GB of bf16 instead of 3.4 GB of f32 per RDB
        conv = lambda h, w: _conv(h, w, jnp.bfloat16)
    elif variant == "f32asm":
        # f32 conv output consumed directly by the assembly (no cast op;
        # the adds read f32 slabs)
        conv = lambda h, w: _conv(h, w, jnp.float32)
    else:  # base: the production path (_rdb_fused): f32 conv -> one cast
        conv = lambda h, w: _conv(h, w, jnp.float32).astype(jnp.bfloat16)

    if variant == "split2":
        # Two independent half-batch chains in one program: if XLA:TPU's
        # scheduler interleaves them, one half's HBM-bound assembly hides
        # under the other half's MXU-bound convs (the 4.5 ms/RDB glue).
        ha = _rdb_base(x[:8], p, g)
        hb = _rdb_base(x[8:], p, g)
        return jnp.concatenate([ha, hb], axis=0)

    c0 = conv(x, p["w0"])
    x1 = _lrelu(c0[..., 0:g] + b[0:g]).astype(jnp.bfloat16)
    c1 = conv(x1, p["w1"])
    x2 = _lrelu(c0[..., g:2 * g] + c1[..., 0:g] + b[g:2 * g]
                ).astype(jnp.bfloat16)
    c2 = conv(x2, p["w2"])
    x3 = _lrelu(c0[..., 2 * g:3 * g] + c1[..., g:2 * g] + c2[..., 0:g]
                + b[2 * g:3 * g]).astype(jnp.bfloat16)
    c3 = conv(x3, p["w3"])
    x4 = _lrelu(c0[..., 3 * g:4 * g] + c1[..., 2 * g:3 * g]
                + c2[..., g:2 * g] + c3[..., 0:g]
                + b[3 * g:4 * g]).astype(jnp.bfloat16)
    c4 = conv(x4, p["w4"])
    x5 = (c0[..., 4 * g:] + c1[..., 3 * g:] + c2[..., 2 * g:]
          + c3[..., g:] + c4 + b[4 * g:])
    return x + 0.2 * x5.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("g", "variant", "nb"))
def trunk(x, stacked, g, variant, nb):
    def step(h, p):
        return rdb_variant(h, p, g, variant), None
    out, _ = lax.scan(step, x, stacked)
    return out


def main():
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)

    g = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (16, 288, 288, 64)), jnp.bfloat16)
    flops_rdb = 2 * 9 * (64 * 192 + 32 * (160 + 128 + 96 + 64)) \
        * x.shape[0] * x.shape[1] * x.shape[2]

    results = {}
    for variant in ("split2", "base", "convonly"):
        times = {}
        for nb in (4, 12):
            cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4,
                                num_feat=64, num_block=nb, num_grow_ch=g)
            params = fuse_rrdbnet_params(
                init_rrdbnet(jax.random.PRNGKey(0), cfg))
            stacked = {k: jnp.asarray(v, jnp.bfloat16 if k != "b"
                                      else jnp.float32)
                       for k, v in params["body"]["rdb1"].items()}
            tic = time.perf_counter()
            float(jnp.sum(trunk(x, stacked, g, variant, nb)
                          .astype(jnp.float32)))
            compile_s = time.perf_counter() - tic
            best = float("inf")
            for _ in range(3):
                tic = time.perf_counter()
                float(jnp.sum(trunk(x, stacked, g, variant, nb)
                              .astype(jnp.float32)))
                best = min(best, time.perf_counter() - tic)
            times[nb] = best
            print(f"# {variant} nb={nb}: {best*1e3:.1f} ms "
                  f"(compile {compile_s:.0f}s)", flush=True)
        per_rdb = (times[12] - times[4]) / 8
        results[variant] = per_rdb
        print(f"{variant}: {per_rdb*1e3:.2f} ms/RDB = "
              f"{flops_rdb/per_rdb/1e12:.1f} TF/s eff "
              f"(production ref 14.5 ms / 43.9 TF/s)", flush=True)

    # numerics: pbf16 vs base on one RDB
    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=1, num_grow_ch=g)
    params = fuse_rrdbnet_params(init_rrdbnet(jax.random.PRNGKey(1), cfg))
    p1 = {k: jnp.asarray(v[0]) for k, v in params["body"]["rdb1"].items()}
    a = np.asarray(rdb_variant(x[:1], p1, g, "base"), np.float32)
    for v in ("pbf16", "f32asm"):
        bv = np.asarray(rdb_variant(x[:1], p1, g, v), np.float32)
        scale = np.abs(a).max()
        print(f"numerics {v} vs base: max|d|={np.abs(a-bv).max():.5f} "
              f"(scale {scale:.2f})", flush=True)


if __name__ == "__main__":
    main()
