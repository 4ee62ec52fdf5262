"""Envelope measurement: can a space-to-depth conv layout beat the C=64 mix?

Round-1 data (benchmarks/RESULTS.md): XLA 3x3 conv envelope on this v5e is
~35 TF/s at C=64 and ~79.5 TF/s at C=128 — channel width is the lever. The
candidate reparameterisation runs every trunk conv in 2x2-s2d space: 3x3
convs C->F become 2x2 convs 4C->4F (1.78x FLOPs, 56%-dense kernels) plus
static realign slices. This script measures, fetch-timed (axon tunnel rule:
block_until_ready is unreliable — fetch a scalar):

  a) the current production mix: 3x3 (16,288,288,64)->192/160/128/96/64
  b) dense 2x2 (16,145,145,256)->768/640/512/384/256 (s2d shapes, pad +1)
  c) (b) with realign-slice + add + lrelu between convs (fusion cost probe)

Decision rule: s2d wins end-to-end if TF/s(b_or_c) / 1.78 > TF/s(a).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.runtime.device import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

REPS = 8  # conv-chain repetitions inside one program (amortize dispatch)


def _conv(x, w, pad="SAME"):
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def chain_a(x, ws):
    """Current fused-RDB shape mix: 3x3, in 64, outs 192/160/128/96/64."""
    for _ in range(REPS):
        acc = None
        for w in ws:  # 64->192, 32->160, 32->128, 32->96, 32->64
            y = _conv(x[..., : w.shape[2]], w)
            part = y[..., :64].astype(jnp.float32)
            acc = part if acc is None else acc + part
        x = jnp.where(acc >= 0, acc, 0.2 * acc).astype(jnp.bfloat16)
        x = jnp.concatenate([x, x[..., :0]], axis=-1) if x.shape[-1] == 64 \
            else x[..., :64]
    return jnp.sum(x.astype(jnp.float32))


def chain_b(x, ws, realign):
    """s2d shapes: 2x2 convs, in 256 (or 128 for growth slabs), outs 4x."""
    h = x
    for _ in range(REPS):
        acc = None
        for w in ws:
            cin = w.shape[2]
            y = _conv(h[..., :cin], w, pad=((1, 1), (1, 1)))
            if realign:
                # True dataflow: realign offsets ride inside the slice reads
                # feeding the add fusion — only the 256-ch sum materializes
                # (as it must anyway), never the realigned wide tensor.
                g = y.shape[-1] // 4
                w64 = min(64, g)
                part = jnp.concatenate([
                    y[:, 1:, 1:, 3 * g:3 * g + w64],
                    y[:, 1:, :-1, 2 * g:2 * g + w64],
                    y[:, :-1, 1:, 1 * g:1 * g + w64],
                    y[:, :-1, :-1, 0:w64],
                ], axis=-1).astype(jnp.float32)
                part = jnp.concatenate(
                    [part] * (256 // part.shape[-1]), axis=-1)
            else:
                part = y[:, :-1, :-1, :256].astype(jnp.float32)
            acc = part if acc is None else acc + part
        h = jnp.where(acc >= 0, acc, 0.2 * acc).astype(jnp.bfloat16)
    return jnp.sum(h.astype(jnp.float32))


def timeit(fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.time()
    float(np.asarray(f(*args)))  # compile + first run
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(f(*args)))
        best = min(best, time.time() - t0)
    return best, compile_s


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")

    B, S = 16, 288
    x_a = jnp.asarray(rng.normal(0, 1, (B, S, S, 64)).astype(np.float32),
                      dtype=jnp.bfloat16)
    outs_a = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    ws_a = [jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)).astype(np.float32),
                        dtype=jnp.bfloat16) for ci, co in outs_a]
    flops_a = REPS * 2 * 9 * B * S * S * sum(ci * co for ci, co in outs_a)
    t, c = timeit(lambda x: chain_a(x, ws_a), x_a)
    print(f"a) 3x3 C64 mix:            {flops_a / t / 1e12:7.1f} TF/s"
          f"  ({t * 1e3:.1f} ms, compile {c:.0f}s)")

    # s2d: spatial 144 (=288/2), channels 4x; growth convs in=128 (4*32)
    Bs, Ss = 16, 144

    def run_b(realign):
        x_b = jnp.asarray(
            rng.normal(0, 1, (Bs, Ss, Ss, 256)).astype(np.float32),
            dtype=jnp.bfloat16)
        outs_b = [(256, 768), (128, 640), (128, 512), (128, 384), (128, 256)]
        ws_b = [jnp.asarray(
            rng.normal(0, 0.05, (2, 2, ci, co)).astype(np.float32),
            dtype=jnp.bfloat16) for ci, co in outs_b]
        flops_b = REPS * 2 * 4 * Ss * Ss * sum(ci * co for ci, co in outs_b)

        t, c = timeit(lambda xb: chain_b(xb, ws_b, realign), x_b)
        tf = Bs * flops_b / t / 1e12
        name = "c) s2d 2x2 + realign:    " if realign else \
               "b) s2d 2x2 C256 mix:     "
        print(f"{name} {tf:7.1f} TF/s  ({t * 1e3:.1f} ms, compile {c:.0f}s)"
              f"  effective/1.78 = {tf / 1.78:.1f} TF/s")
        return tf

    run_b(False)
    run_b(True)

    # c2) select-based realign: channels interleaved (feature-major,
    # subpix-minor) so the realign is a lane-phase select over 4 spatially
    # shifted reads of the same tensor — no concat to materialize.
    def chain_c2(x, ws):
        h = x
        for _ in range(REPS):
            acc = None
            for w in ws:
                cin = w.shape[2]
                y = _conv(h[..., :cin], w, pad=((1, 1), (1, 1)))
                co = y.shape[-1]
                phase = jax.lax.broadcasted_iota(jnp.int32, (co,), 0) % 4
                r = jnp.where(
                    (phase == 0)[None, None, None, :], y[:, 1:, 1:, :],
                    jnp.where((phase == 1)[None, None, None, :],
                              y[:, 1:, :-1, :],
                              jnp.where((phase == 2)[None, None, None, :],
                                        y[:, :-1, 1:, :], y[:, :-1, :-1, :])))
                part = r[..., :256]
                acc = part if acc is None else acc + part
            h = jnp.where(acc >= 0, acc, 0.2 * acc)
        return jnp.sum(h.astype(jnp.float32))

    x_b = jnp.asarray(rng.normal(0, 1, (Bs, Ss, Ss, 256)).astype(np.float32),
                      dtype=jnp.bfloat16)
    outs_b = [(256, 768), (128, 640), (128, 512), (128, 384), (128, 256)]
    ws_b = [jnp.asarray(rng.normal(0, 0.05, (2, 2, ci, co)).astype(np.float32),
                        dtype=jnp.bfloat16) for ci, co in outs_b]
    flops_b = REPS * 2 * 4 * Bs * Ss * Ss * sum(ci * co for ci, co in outs_b)
    t, c = timeit(lambda xb: chain_c2(xb, ws_b), x_b)
    tf = flops_b / t / 1e12
    print(f"c2) s2d select-realign:    {tf:7.1f} TF/s  ({t * 1e3:.1f} ms, "
          f"compile {c:.0f}s)  effective/1.78 = {tf / 1.78:.1f} TF/s")

    # d) 1D row-s2d: kernel (2,3), in 2C=128, outs 2x, 1.33x tax, 2-phase
    # select realign on rows only.
    def chain_d(x, ws):
        h = x
        for _ in range(REPS):
            acc = None
            for w in ws:
                cin = w.shape[2]
                y = _conv(h[..., :cin], w, pad=((1, 1), (1, 1)))
                co = y.shape[-1]
                phase = jax.lax.broadcasted_iota(jnp.int32, (co,), 0) % 2
                r = jnp.where((phase == 0)[None, None, None, :],
                              y[:, 1:, :, :], y[:, :-1, :, :])
                part = r[..., :128]
                acc = part if acc is None else acc + part
            h = jnp.where(acc >= 0, acc, 0.2 * acc)
        return jnp.sum(h.astype(jnp.float32))

    Sd = 144
    x_d = jnp.asarray(
        rng.normal(0, 1, (Bs, Sd, 2 * Sd, 128)).astype(np.float32),
        dtype=jnp.bfloat16)
    outs_d = [(128, 384), (64, 320), (64, 256), (64, 192), (64, 128)]
    ws_d = [jnp.asarray(
        rng.normal(0, 0.05, (2, 3, ci, co)).astype(np.float32),
        dtype=jnp.bfloat16) for ci, co in outs_d]
    flops_d = REPS * 2 * 6 * Bs * Sd * 2 * Sd * sum(ci * co
                                                    for ci, co in outs_d)
    t, c = timeit(lambda xd: chain_d(xd, ws_d), x_d)
    tf = flops_d / t / 1e12
    print(f"d) 1D row-s2d (2,3):       {tf:7.1f} TF/s  ({t * 1e3:.1f} ms, "
          f"compile {c:.0f}s)  effective/1.33 = {tf / 1.333:.1f} TF/s")


if __name__ == "__main__":
    main()
