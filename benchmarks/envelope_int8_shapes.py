#!/usr/bin/env python3
"""Roadmap item (b) decision data: int8 XLA conv envelope at the EXACT
fused-RDB trunk shapes, vs the bf16 baseline, plus the dense rows-s2d
2x3-kernel formulation (the only int8 route to K=128 lanes).

Round-2 envelopes measured generic CxC chains (int8 C=64 -> 26.7 TOP/s,
C=128 -> 95.3). The trunk's actual conv mix is (Cin -> Cout):
(64->192), (32->160), (32->128), (32->96), (32->64) at (16, ~288^2).
This probe slope-times each shape in bf16 and int8, and the rows-s2d
packed variants (2Cin -> 2Cout, 2x3 kernel at half rows) that a
phase-alternating int8 trunk would run, then prints the FLOP-weighted
effective rate for each trunk formulation (incl. the 4/3 row-window tax
for phase-flip convs and 2x for the phase-preserving (0,5)/clique edges —
see RESULTS.md round-3 notes).

Run ON TPU: python benchmarks/envelope_int8_shapes.py
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

B, S = 16, 288
SHAPES = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]


@functools.partial(jax.jit, static_argnames=("nreps",))
def _chain(x, ws, nreps):
    """scan over nreps distinct weight sets; per step one full conv."""
    def step(acc, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(jnp.int32 if w.dtype == jnp.int8
                                    else jnp.float32))
        # max|y|, not mean: a LINEAR reduction lets XLA strength-reduce
        # reduce(conv(x, w)) into per-tap input sums, producing fake >peak
        # rates (observed 231 "TF/s" on a 197 TF/s-peak chip).
        return jnp.maximum(acc,
                           jnp.max(jnp.abs(y.astype(jnp.float32)))), None
    acc, _ = lax.scan(step, jnp.float32(0.0), ws)
    return acc


def rate(x, mk_w, kh, kw, cin, cout, dtype):
    rng = np.random.default_rng(0)
    times = {}
    for n in (8, 24):
        ws = mk_w(rng, n, kh, kw, cin, cout, dtype)
        float(_chain(x, ws, n))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(_chain(x, ws, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_conv = (times[24] - times[8]) / 16
    px = x.shape[0] * x.shape[1] * x.shape[2]
    flops = 2 * kh * kw * cin * cout * px
    return flops / per_conv / 1e12, per_conv


def mk_w(rng, n, kh, kw, cin, cout, dtype):
    if dtype == jnp.int8:
        return jnp.asarray(rng.integers(-127, 127, (n, kh, kw, cin, cout)),
                           jnp.int8)
    return jnp.asarray(rng.standard_normal((n, kh, kw, cin, cout)) * 0.05,
                       dtype)


def main():
    dev = jax.devices()[0].device_kind
    print(f"# device={dev} batch={B} spatial={S}^2 (slope-timed)",
          flush=True)
    rng = np.random.default_rng(1)

    results = {}
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        # plain trunk shapes, 3x3
        for cin, cout in SHAPES:
            if dtype == jnp.int8:
                x = jnp.asarray(rng.integers(-127, 127, (B, S, S, cin)),
                                jnp.int8)
            else:
                x = jnp.asarray(rng.standard_normal((B, S, S, cin)) * 0.3,
                                dtype)
            r, t = rate(x, mk_w, 3, 3, cin, cout, dtype)
            results[(name, "plain", cin, cout)] = r
            print(f"{name} plain 3x3 ({cin}->{cout}): {r:.1f} "
                  f"T{'OP' if name == 'int8' else 'F'}/s "
                  f"({t*1e3:.2f} ms/conv)", flush=True)
        # rows-s2d phase-flip shapes: (B, S/2, S, 2Cin) -> 2x3 -> 2Cout
        for cin, cout in SHAPES:
            c2, d2 = 2 * cin, 2 * cout
            if dtype == jnp.int8:
                x = jnp.asarray(rng.integers(-127, 127, (B, S // 2, S, c2)),
                                jnp.int8)
            else:
                x = jnp.asarray(
                    rng.standard_normal((B, S // 2, S, c2)) * 0.3, dtype)
            r, t = rate(x, mk_w, 2, 3, c2, d2, dtype)
            results[(name, "s2d23", cin, cout)] = r
            print(f"{name} s2d 2x3 ({c2}->{d2} half-rows): {r:.1f} raw, "
                  f"{r*0.75:.1f} effective after 4/3 tax "
                  f"({t*1e3:.2f} ms/conv)", flush=True)

    # FLOP-weighted trunk summary
    w = np.array([9 * c * d for c, d in SHAPES], np.float64)
    w /= w.sum()
    for name in ("bf16", "int8"):
        plain = 1.0 / sum(wi / results[(name, "plain", c, d)]
                          for wi, (c, d) in zip(w, SHAPES))
        s2d = 1.0 / sum(wi / (results[(name, "s2d23", c, d)] * 0.75)
                        for wi, (c, d) in zip(w, SHAPES))
        print(f"{name}: FLOP-weighted plain trunk {plain:.1f}, "
              f"rows-s2d(all phase-flip, no relayout cost) {s2d:.1f} "
              f"effective  [XLA bf16 production: 43.9]", flush=True)


if __name__ == "__main__":
    main()
