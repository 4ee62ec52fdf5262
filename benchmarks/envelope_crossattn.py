#!/usr/bin/env python3
"""Where do the SD-x4 cross-attention milliseconds go? (round-4 follow-up
to the step re-decomposition: crossattn share 0.519 at latent 128 —
RESULTS.md — despite ~4.6 GFLOP/layer against skv=77 text tokens.)

Times ONE cross-attention sub-block (layer_norm + q/k/v/out projections +
attention + residual) at each of the UNet's three layer geometries, with
three attention-core formulations:

  xla_bhqk   — production layers.attention (einsum bqhd,bkhd->bhqk,
               f32 softmax over the 77-key axis, einsum back)
  xla_qmajor — head-last scores (bqhd,bkhd->bqhk): no transpose of the
               big q tensor in or out
  flash      — kernels/attention.flash_attention: skv=77 pads to one
               128-wide KV block (extra-dim masking), the whole
               qk/softmax/av fused in VMEM per q block

Blocks chain through a jitted fori_loop with feedback (no LICM of the
timed body); slope-timed HI-vs-LO so dispatch noise cancels. Layer mix at
latent 128 (UNetConfig defaults): 5 layers at sq=4096/c=512, 5 at
sq=1024/c=512, 6 at sq=256/c=1024; heads=8, context (1,77,1024).

Run ON TPU: python benchmarks/envelope_crossattn.py
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.kernels.attention import (
    flash_attention)
from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
    attention as xla_attention)

HI, LO = 48, 12
HEADS = 8
SKV = 77
CTX_DIM = 1024
# (sq, channels, count in one batch-1 UNet pass at latent 128)
GEOMS = ((4096, 512, 5), (1024, 512, 5), (256, 1024, 6))


def qmajor_attention(q, k, v, num_heads, dtype=jnp.bfloat16):
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).astype(dtype)
    kh = k.reshape(b, skv, num_heads, hd).astype(dtype)
    vh = v.reshape(b, skv, num_heads, hd).astype(dtype)
    scores = jnp.einsum("bqhd,bkhd->bqhk", qh, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(hd), axis=-1)
    out = jnp.einsum("bqhk,bkhd->bqhd", probs.astype(dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, sq, d)


def flash_core(q, k, v, num_heads, dtype=jnp.bfloat16):
    b, sq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    out = flash_attention(qh.astype(dtype), kh.astype(dtype),
                          vh.astype(dtype))
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d).astype(jnp.float32)


CORES = {"xla_bhqk": xla_attention, "xla_qmajor": qmajor_attention,
         "flash": flash_core}


def _ln(x):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * lax.rsqrt(var + 1e-5)


@functools.partial(jax.jit, static_argnames=("core", "steps", "attn_only"))
def loop(x, ctx, wq, wk, wv, wo, core, steps, attn_only):
    fn = CORES[core]

    def body(i, x):
        h = _ln(x)
        q = jnp.einsum("bqc,cd->bqd", h.astype(jnp.bfloat16), wq,
                       preferred_element_type=jnp.float32)
        k = jnp.einsum("bkc,cd->bkd", ctx.astype(jnp.bfloat16), wk,
                       preferred_element_type=jnp.float32)
        v = jnp.einsum("bkc,cd->bkd", ctx.astype(jnp.bfloat16), wv,
                       preferred_element_type=jnp.float32)
        if attn_only:
            a = fn(q, k, v, HEADS)
            return x + a  # skip out-proj: isolates the attention core
        a = fn(q, k, v, HEADS)
        o = jnp.einsum("bqd,dc->bqc", a.astype(jnp.bfloat16), wo,
                       preferred_element_type=jnp.float32)
        # feed the output back (data dependence defeats LICM); the +0.01*i
        # keeps values bounded without changing the op mix
        return x + 0.001 * o

    return lax.fori_loop(0, steps, body, x)


def slope(fn, reps=6):
    # best-per-side (min over reps), then ONE slope — per-pair minima are
    # hopelessly biased under the tunnel's asymmetric dispatch noise (the
    # first run of this envelope produced full < attn-core rows that way).
    fn(HI)
    fn(LO)
    his, los = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(HI); his.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(LO); los.append(time.perf_counter() - t0)
    return (min(his) - min(los)) / (HI - LO)


def main():
    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(key, (1, SKV, CTX_DIM), jnp.float32)
    totals = {c: 0.0 for c in CORES}
    for sq, c, count in GEOMS:
        x = jax.random.normal(key, (1, sq, c), jnp.float32)
        wq = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
        wk = jax.random.normal(key, (CTX_DIM, c), jnp.bfloat16) * 0.02
        wv = jax.random.normal(key, (CTX_DIM, c), jnp.bfloat16) * 0.02
        wo = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
        for core in CORES:
            # NB: block_until_ready returns EARLY over the axon tunnel
            # (RESULTS.md round-4 stage breakdown); a scalar fetch is the
            # only reliable completion barrier in this environment.
            t_full = slope(lambda s: float(jnp.sum(
                loop(x, ctx, wq, wk, wv, wo, core, s, False))))
            t_attn = slope(lambda s: float(jnp.sum(
                loop(x, ctx, wq, wk, wv, wo, core, s, True))))
            totals[core] += count * t_full
            print(f"sq={sq:5d} c={c:4d}  {core:10s} "
                  f"full {t_full*1e6:8.1f} us/layer   "
                  f"attn-core {t_attn*1e6:8.1f} us", flush=True)
    print("\n# extrapolated cross-attn total per batch-1 UNet pass "
          "(5x4096 + 5x1024 + 6x256):")
    for core, t in totals.items():
        print(f"#   {core:10s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
