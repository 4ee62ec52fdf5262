"""Pinned drift-control program for the SD-x4 metric (VERDICT round 4 #4).

`sd_x4_steps_per_s` is same-session-relative ONLY: the round-4 day-drift
control re-measured the 62.9 steps/s record commit at 31.5 in a later
session (~45% device-side drift, RESULTS.md "SD metric day-drift control")
while the trunk metric stayed within 0.2%. A cross-round delta in the SD
number therefore cannot be read as a regression without an in-session
control. This module automates that control:

  * `control_rate()` runs a FROZEN compute program — a fixed loop of
    conv3x3 + batched-matmul attention + groupnorm at fixed shapes, the
    same op mix as a UNet denoise step, pure XLA (no Pallas, no model code)
    so its cost can only change with the device/tunnel/compiler, never with
    this repo's kernels;
  * `PINNED_RATE_IT_PER_S` is that program's rate measured once on the
    session that produced the round-5 bench record (see RESULTS.md);
  * bench.py reports `sd_x4_control_ratio = control_rate()/PINNED_RATE`.

Reading rule (documented once, RESULTS.md): a round-over-round change in
`sd_x4_steps_per_s` is a code regression only if it is NOT explained by the
same change in `sd_x4_control_ratio`. Ratio ~1.0 -> the session is
comparable to the record session; ratio 0.5 -> expect the SD number to halve
for environmental reasons alone.

DO NOT EDIT the control program (shapes, loop count, op mix): any edit
invalidates every prior pinned rate. If it must change, re-pin the constant
in the same session and record both rates in RESULTS.md.
"""

from __future__ import annotations

import functools
import time

import numpy as np

# Pinned 2026-08-19 01:09 UTC (TPU v5e via tunnel; same session whose trunk
# bench anchors the round-5 record) — see RESULTS.md "Round 5: SD metric
# drift control automated". None means "not yet pinned": bench.py then
# reports the raw control rate only, and the first healthy session should
# pin it.
PINNED_RATE_IT_PER_S: float | None = 167.84

_N_ITERS = 8          # fori_loop trip count per timed call (frozen)
_H = _W = 32          # conv field (frozen)
_C = 256              # channels (frozen)
_SEQ = 1024           # attention tokens = _H*_W (frozen)
_HEADS = 8            # (frozen)


def _control_program():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x, wc, wq, wk, wv, wo):
        def body(_, x):
            # conv3x3 (MXU) -> groupnorm (VPU) -> full self-attention
            # (batched matmuls) -> residual; bf16 compute, f32 accumulate.
            y = lax.conv_general_dilated(
                x.astype(jnp.bfloat16), wc.astype(jnp.bfloat16), (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            g = y.reshape(1, _H * _W, 8, _C // 8)
            mu = g.mean(axis=(1, 3), keepdims=True)
            var = g.var(axis=(1, 3), keepdims=True)
            y = ((g - mu) * lax.rsqrt(var + 1e-5)).reshape(1, _H, _W, _C)
            s = y.reshape(1, _SEQ, _C)
            d = _C // _HEADS
            q = (s.astype(jnp.bfloat16) @ wq.astype(jnp.bfloat16)
                 ).reshape(1, _SEQ, _HEADS, d).transpose(0, 2, 1, 3)
            k = (s.astype(jnp.bfloat16) @ wk.astype(jnp.bfloat16)
                 ).reshape(1, _SEQ, _HEADS, d).transpose(0, 2, 1, 3)
            v = (s.astype(jnp.bfloat16) @ wv.astype(jnp.bfloat16)
                 ).reshape(1, _SEQ, _HEADS, d).transpose(0, 2, 1, 3)
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                             preferred_element_type=jnp.float32)
            att = jax.nn.softmax(att * (d ** -0.5), axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", att.astype(jnp.bfloat16), v,
                           preferred_element_type=jnp.float32)
            o = o.transpose(0, 2, 1, 3).reshape(1, _SEQ, _C)
            o = (o.astype(jnp.bfloat16) @ wo.astype(jnp.bfloat16)
                 ).astype(jnp.float32)
            return x + o.reshape(1, _H, _W, _C)

        return lax.fori_loop(0, _N_ITERS, body, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, _H, _W, _C)).astype(np.float32))
    wc = jnp.asarray(rng.normal(0, 0.02, (3, 3, _C, _C)).astype(np.float32))
    mats = [jnp.asarray(rng.normal(0, 0.02, (_C, _C)).astype(np.float32))
            for _ in range(4)]
    return functools.partial(run, x, wc, *mats)


def control_rate(reps: int = 3) -> float:
    """Iterations/second of the frozen control program (best of ``reps``)."""
    fn = _control_program()
    out = fn()
    float(np.asarray(out).ravel()[0])  # force full completion (tunnel-safe)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn()).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return _N_ITERS / best


if __name__ == "__main__":
    import json

    rate = control_rate()
    line = {"control_rate_it_per_s": round(rate, 3),
            "pinned": PINNED_RATE_IT_PER_S}
    if PINNED_RATE_IT_PER_S:
        line["control_ratio"] = round(rate / PINNED_RATE_IT_PER_S, 3)
    print(json.dumps(line))
