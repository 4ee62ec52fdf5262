#!/usr/bin/env python3
"""In-context probe for the round-3 dform kernel retry (roadmap item a).

Question: with K-concatenated per-conv windows and bf16 dot outputs (one dot
per stage, f32 MXU accumulation, single bf16 rounding — the XLA path's own
rounding points), what does the REAL step body cost per grid step?

Round-2 lesson (benchmarks/RESULTS.md, memory notes): resident-loop probes
overstate in-context MXU rates ~3x; only a sequential-grid kernel with the
true per-step operand/output traffic predicts the integrated kernel. This
probe walks the same grid as kernels/rdb_dform.py (bh=8 row blocks, wbw=144
column blocks) and per step:

  v1 pattern (baseline): 15 dots, f32 outputs, f32 cross-dot adds
  v2 pattern:            5 K-concat lhs builds + 5 dots, bf16 outputs

Stage shapes (C=64, g=32): lhs (bh*e, 12*Cin) x (12*Cin, N) for
(Cin, N) = (64, 384), (32, 320), (32, 256), (32, 192), (32, 128).

Timing: slope method — two step counts, fetch-forced, difference removes
fixed costs (the ~30 ms tunnel round-trip and pipeline fill).

Run ON TPU: python benchmarks/envelope_v2_step.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8
WBW = 144
WBP = WBW + 16
E = WBP - 2
C, G = 64, 32
STAGES = [(64, 384), (32, 320), (32, 256), (32, 192), (32, 128)]


def _mk_kernel_v2(nsteps):
    def kernel(x_ref, w0, w1, w2, w3, w4, o_ref, d0, d1, d2, d3, d4):
        wks = (w0, w1, w2, w3, w4)
        dks = (d0, d1, d2, d3, d4)
        # ingest: refresh the stage-1 window buffer rows from the input block
        d0[0:BH, 0:WBW, 0:2 * C] = x_ref[0]

        out_acc = None
        for s, (cin, n) in enumerate(STAGES):
            dk = dks[s]
            kdim = 4 * cin
            m = BH * E
            lhs = jnp.concatenate(
                [dk[0:BH, dc:dc + E, :].reshape(m, kdim) for dc in range(3)],
                axis=1)                                  # (m, 12*cin) bf16
            # Mosaic requires a 32-bit matmul accumulator; the single
            # rounding point is preserved by casting the one f32 result.
            out = jax.lax.dot_general(
                lhs, wks[s][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            out = out.reshape(BH, E, n)
            # feed the next stage's window buffer (emit_stage analog: the
            # first 2g lanes become the next stage's activation, written to
            # its three row slots)
            if s + 1 < 5:
                nxt = dks[s + 1]
                g2 = 2 * G
                xk = out[:, :, 0:g2]
                nxt[0:BH, 1:1 + E, 0:g2] = xk
                nxt[1:1 + BH, 1:1 + E, g2:g2 + G] = xk[:, :, G:g2]
                nxt[0:BH, 1:1 + E, g2 + G:2 * g2] = xk[:, :, 0:G]
            acc = jnp.sum(out[:, :, 0:128].astype(jnp.float32), axis=-1,
                          keepdims=True)
            out_acc = acc if out_acc is None else out_acc + acc
        o_ref[0] = out_acc[:, 0:WBW, 0]

    return kernel


def _mk_kernel_v1(nsteps):
    def kernel(x_ref, w0, w1, w2, w3, w4, o_ref, d0, d1, d2, d3, d4):
        wks = (w0, w1, w2, w3, w4)
        dks = (d0, d1, d2, d3, d4)
        d0[0:BH, 0:WBW, 0:2 * C] = x_ref[0]

        out_acc = None
        for s, (cin, n) in enumerate(STAGES):
            dk = dks[s]
            kdim = 4 * cin
            m = BH * E
            # v1: chunked N (<=128), 3 shifted dots, f32 outputs + f32 adds
            outs = []
            for n0 in range(0, n, 128):
                n1 = min(n0 + 128, n)
                acc = None
                for dc in range(3):
                    lhs = dk[0:BH, dc:dc + E, :].reshape(m, kdim)
                    part = jax.lax.dot_general(
                        lhs, wks[s][dc * kdim:(dc + 1) * kdim, n0:n1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
                outs.append(acc)
            out = jnp.concatenate(outs, axis=1).astype(
                jnp.bfloat16).reshape(BH, E, n)
            if s + 1 < 5:
                nxt = dks[s + 1]
                g2 = 2 * G
                xk = out[:, :, 0:g2]
                nxt[0:BH, 1:1 + E, 0:g2] = xk
                nxt[1:1 + BH, 1:1 + E, g2:g2 + G] = xk[:, :, G:g2]
                nxt[0:BH, 1:1 + E, g2 + G:2 * g2] = xk[:, :, 0:G]
            acc = jnp.sum(out[:, :, 0:128].astype(jnp.float32), axis=-1,
                          keepdims=True)
            out_acc = acc if out_acc is None else out_acc + acc
        o_ref[0] = out_acc[:, 0:WBW, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("nsteps", "variant"))
def run_steps(x, ws, nsteps, variant):
    kern = (_mk_kernel_v2 if variant == "v2" else _mk_kernel_v1)(nsteps)
    wspecs = [pl.BlockSpec(w.shape, (lambda nd: lambda gi: (0,) * nd)(2),
                           memory_space=pltpu.VMEM) for w in ws]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nsteps, BH, WBW), jnp.float32),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, BH, WBW, 2 * C), lambda gi: (gi, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((1, BH, WBW), lambda gi: (gi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BH + 2, WBP, 4 * 64), jnp.bfloat16),   # d0 (stage1)
            pltpu.VMEM((BH + 2, WBP, 4 * 32), jnp.bfloat16),   # d1
            pltpu.VMEM((BH + 2, WBP, 4 * 32), jnp.bfloat16),   # d2
            pltpu.VMEM((BH + 2, WBP, 4 * 32), jnp.bfloat16),   # d3
            pltpu.VMEM((BH + 2, WBP, 4 * 32), jnp.bfloat16),   # d4
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ws)


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((12 * cin, n)) * 0.05, jnp.bfloat16)
          for cin, n in STAGES]
    flops_step = sum(2 * BH * E * 12 * cin * n for cin, n in STAGES)
    useful_step = flops_step * 3 / 4  # the 4/3 dense-window row tax

    for variant in ("v2", "v1"):
        res = {}
        for nsteps in (64, 256):
            x = jnp.asarray(
                rng.standard_normal((nsteps, BH, WBW, 2 * C)) * 0.1,
                jnp.bfloat16)
            t0 = time.perf_counter()
            float(jnp.sum(run_steps(x, ws, nsteps, variant)))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(run_steps(x, ws, nsteps, variant)))
                best = min(best, time.perf_counter() - t0)
            res[nsteps] = best
            print(f"# {variant} nsteps={nsteps}: best={best*1e3:.2f} ms "
                  f"(compile {compile_s:.0f}s)", flush=True)
        us_per_step = (res[256] - res[64]) / (256 - 64) * 1e6
        raw = flops_step / (us_per_step * 1e-6) / 1e12
        eff = useful_step / (us_per_step * 1e-6) / 1e12
        print(f"{variant}: {us_per_step:.1f} us/step  raw={raw:.1f} TF/s  "
              f"effective={eff:.1f} TF/s  (XLA trunk ref: 22.6 us-equiv, "
              f"43.9 TF/s eff)", flush=True)


if __name__ == "__main__":
    main()
