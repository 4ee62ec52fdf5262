#!/usr/bin/env python3
"""Why do SwinIR's linears run at ~15 TF/s? Isolate the matmul shapes.

envelope_swinir.py showed linears_only (the qkv/proj/mlp chain + convs,
~0.93 TF per forward) takes 61 ms -> ~15 TF/s, far below what
(36864, 180) x (180, 540)-class dots should sustain.  This probe times the
candidate shapes in-context (lax.scan over real per-layer weights, carried
activations — real HBM traffic, not a resident loop):

  A flat_chain   36 x [x(36864,180) -> qkv(540) -> proj(180) -> fc1(360)
                  -> fc2(180)], bf16 in, f32 dot out, astype(bf16) between
  B batched      same chain but x kept (576, 64, 180) (per-window batch)
  C convs        7 x conv3x3 180->180 on (1,192,192,180)
  D big_dot      36 x (36864, 512) x (512, 512) — lane-aligned control
  E pad192       chain A with C padded 180->192 (sublane-mult lanes)
  F pad256       chain A with C padded 180->256, N rounded to 128-mults
                  (qkv 640, fc1 384) — fully lane-aligned variant

Slope timing: scan lengths (8, 108) difference removes warmup/dispatch.
A 10-layer contrast (first attempt) was inside tunnel jitter (~1 ms on a
30 ms round-trip) and produced >peak rates; 100 layers puts the delta at
10-50 ms of real work.

STRENGTH-REDUCTION GUARD: a purely linear layer chain consumed by
jnp.sum gets algebraically collapsed by XLA (first run of this probe
measured 277 "TF/s" on a 197-peak chip and negative slopes).  Every
layer therefore applies a ReLU between dots and the consumer is
max|y| — same guard the conv envelopes needed (see memory notes /
RESULTS.md round-3 conv-envelope traps).

Run ON TPU: python benchmarks/envelope_swin_mm.py
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

M = 36864          # tokens at 192^2
NW, N = 576, 64    # windows x tokens/window


def chain_flops(c, q, p, f1):
    # NB: the chain applies y = (x @ wq)[:, :c]; XLA folds the slice into
    # the dot (computes x @ wq[:, :c]), so count c — not q — output
    # columns for the first dot.  Counting q overstated rates ~1.8x
    # (>chip peak) in the first runs of this probe.
    del q
    return 2 * M * (c * c + c * p + p * f1 + f1 * p)


def make_chain(c, qn, reshape_windows=False):
    """One 'layer': x->qkv(qn) -> take first c -> proj(c) -> fc1(2c) -> fc2(c)."""
    f1 = 2 * c

    def layer(x, w):
        wq, wp, w1, w2 = w
        def nl(y):
            # ReLU between dots: negligible VPU cost, blocks XLA from
            # strength-reducing the linear chain under the reduction.
            return jnp.maximum(y, 0.).astype(jnp.bfloat16)

        if reshape_windows:
            xx = x.reshape(NW, N, c)
            y = jnp.einsum("bni,io->bno", xx, wq,
                           preferred_element_type=jnp.float32)
            y = nl(y[..., :c])
            y = jnp.einsum("bni,io->bno", y, wp,
                           preferred_element_type=jnp.float32)
            y = nl(y).reshape(M, c)
        else:
            y = nl((x @ wq)[:, :c])
            y = nl(y @ wp)
        y = nl(y @ w1)
        y = nl(y @ w2)
        return y

    def run(x, ws, steps):
        def body(carry, w):
            return layer(carry, w), 0.
        y, _ = lax.scan(body, x, ws)
        return y

    rng = np.random.default_rng(0)

    def mk(sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32),
                           dtype=jnp.bfloat16) * 0.05

    def ws(L):
        return (mk((L, c, qn)), mk((L, c, c)), mk((L, c, f1)), mk((L, f1, c)))

    x0 = mk((M, c))
    return run, x0, ws, chain_flops(c, qn, c, f1)


def time_slope(fn, x0, ws, flops_per_layer, name):
    def fetch(y):
        return float(jnp.max(jnp.abs(y)))

    f2 = jax.jit(lambda x, w: fn(x, w, 8))
    f12 = jax.jit(lambda x, w: fn(x, w, 108))
    w2, w12 = ws(8), ws(108)
    fetch(f2(x0, w2)); fetch(f12(x0, w12))
    best2 = best12 = 1e9
    for _ in range(6):
        t0 = time.time(); fetch(f2(x0, w2))
        best2 = min(best2, time.time() - t0)
        t0 = time.time(); fetch(f12(x0, w12))
        best12 = min(best12, time.time() - t0)
    dt = (best12 - best2) / 100
    tf = flops_per_layer / dt / 1e12
    print(f"{name:12s} {dt * 1e3:7.3f} ms/layer  {tf:7.1f} TF/s"
          f"   [abs L8 {best2 * 1e3:7.1f} ms, L108 {best12 * 1e3:7.1f} ms]",
          flush=True)
    return tf


def main():
    # A: exact model shapes
    run, x0, ws, fl = make_chain(180, 540)
    time_slope(run, x0, ws, fl, "A flat")
    # B: batched per-window
    run, x0, ws, fl = make_chain(180, 540, reshape_windows=True)
    time_slope(run, x0, ws, fl, "B windows")
    # D: lane-aligned control
    run, x0, ws, fl = make_chain(512, 512 * 3)
    time_slope(run, x0, ws, fl, "D c512")
    # E: c=192
    run, x0, ws, fl = make_chain(192, 576)
    time_slope(run, x0, ws, fl, "E c192")
    # F: c=256
    run, x0, ws, fl = make_chain(256, 768)
    time_slope(run, x0, ws, fl, "F c256")

    # C: conv chain
    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.standard_normal((1, 192, 192, 180)),
                     dtype=jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((24, 3, 3, 180, 180)),
                     dtype=jnp.bfloat16) * 0.02

    def convs(x, w, k):
        def body(c, wi):
            y = lax.conv_general_dilated(
                c, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y, 0.).astype(jnp.bfloat16), 0.
        y, _ = lax.scan(body, x, w[:k])
        return y

    f3 = jax.jit(lambda x, w: convs(x, w, 4))
    f7 = jax.jit(lambda x, w: convs(x, w, 24))
    mx = lambda y: float(jnp.max(jnp.abs(y)))
    mx(f3(xc, wc)); mx(f7(xc, wc))
    b3 = b7 = 1e9
    for _ in range(6):
        t0 = time.time(); mx(f3(xc, wc)); b3 = min(b3, time.time() - t0)
        t0 = time.time(); mx(f7(xc, wc)); b7 = min(b7, time.time() - t0)
    dt = (b7 - b3) / 20
    tf = 2 * M * 9 * 180 * 180 / dt / 1e12
    print(f"{'C convs':12s} {dt * 1e3:7.3f} ms/conv   {tf:7.1f} TF/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
