#!/usr/bin/env python3
"""SwinIR STL decomposition via ablation (VERDICT r3 #3 groundwork).

Round 3 established the branch is glue-bound (shapes sustain 110-170 TF/s
isolated, assembled forward ~14 TF/s) but never located the glue. Each
variant here swaps one STL component for a shape-preserving passthrough by
monkeypatching models/swinir internals and re-jitting the forward; the
difference in full-forward time is that component's share. This tells us
whether a Pallas STL-block kernel (the round-3 roadmap lever) would attack
the right ops before paying its Mosaic compile risk.

Variants:
  base        unmodified forward
  no_ln       LayerNorms -> scale/shift only (no mean/var passes)
  no_attnmix  window attention keeps qkv+proj linears but skips
              scores/softmax/av and the head transposes (o = q)
  no_attn     whole window-attention call -> identity
  no_mlp      fc1/gelu/fc2 -> identity
(the cyclic shift/roll share is part of the no_attn-minus-no_attnmix
residual; it has no standalone variant)

Run ON TPU: python benchmarks/envelope_swin_decomp.py
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

from neural_enhanced_super_resolution_tpu.models import swinir as sw


def timed(fn, x, reps=3):
    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + force
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(x).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = sw.SwinIRConfig()  # real-world M x4: 180 dim, 6x6 STL, ws 8
    params = sw.init_swinir(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 288, 288, 3)).astype(np.float32))

    orig_ln = sw._ln
    orig_attn = sw._window_attention
    orig_lin = sw._lin

    def make_fn():
        fwd = sw.swinir_forward.__wrapped__

        @jax.jit
        def fn(xx):
            return fwd(params, xx, cfg, "bfloat16")
        return fn

    def ln_passthrough(xv, p, name, cdt):
        return (xv.astype(jnp.float32) * p[f"{name}.weight"]
                + p[f"{name}.bias"]).astype(cdt)

    def attn_no_mix(xw, p, base, heads, bias, mask, cdt):
        qkv = sw._lin(xw, p, f"{base}.attn.qkv", cdt)
        o = qkv[..., :xw.shape[-1]]
        return sw._lin(o, p, f"{base}.attn.proj", cdt)

    def attn_identity(xw, p, base, heads, bias, mask, cdt):
        return xw

    variants = {}

    variants["base"] = {}
    variants["no_ln"] = {"_ln": ln_passthrough}
    variants["no_attnmix"] = {"_window_attention": attn_no_mix}
    variants["no_attn"] = {"_window_attention": attn_identity}

    def lin_skip_mlp(xv, p, name, cdt):
        if ".mlp." in name:
            return xv if xv.shape[-1] == p[f"{name}.weight"].shape[1] \
                else jnp.zeros(xv.shape[:-1] + (p[f"{name}.weight"].shape[1],),
                               cdt)
        return orig_lin(xv, p, name, cdt)

    variants["no_mlp"] = {"_lin": lin_skip_mlp}

    results = {}
    for name, patches in variants.items():
        for attr, repl in patches.items():
            setattr(sw, attr, repl)
        try:
            t = timed(make_fn(), x)
        finally:
            sw._ln = orig_ln
            sw._window_attention = orig_attn
            sw._lin = orig_lin
        results[name] = t
        print(f"# {name:12s} {t*1e3:8.1f} ms", flush=True)

    base = results["base"]
    mp_out = 288 * 288 * 16 / 1e6
    print(f"base: {base*1e3:.1f} ms = {mp_out/base:.2f} MP_out/s")
    for name, t in results.items():
        if name != "base":
            print(f"{name}: share {(base - t)/base*100:5.1f}%  "
                  f"({(base - t)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
