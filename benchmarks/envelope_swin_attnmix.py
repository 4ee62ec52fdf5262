#!/usr/bin/env python3
"""Window-attention MIXING reformulations (SwinIR, VERDICT r3 #3).

The STL decomposition (envelope_swin_decomp.py) put 46% of the SwinIR
forward in the attention mixing: scores/softmax/av over (B*nW*heads) tiny
(64x30)@(30x64) matmuls that XLA runs at ~1.3 TF/s. This probe slope-times
the mixing alone at the production shape (288^2 tile, b=1: 1296 windows x
6 heads, n=64, hd=30) across layout reformulations:

  v0_4d      the production einsum pair (bhnd,bhmd->bhnm / bhnm,bhmd->bhnd)
  v1_3d      heads flattened into the batch dim (Bnd,Bmd->Bnm)
  v2_pad32   head dim zero-padded 30->32 (lane-aligned K)
  v3_pack2   two windows packed per matmul (128-token M/N, block masked,
             2x FLOPs but full-width MXU tiles)
  v4_pack4   four windows packed (256-token M/N, 4x FLOPs)
  v5_bf16s   scores kept bf16 end-to-end (softmax in f32)

Each variant includes bias add + softmax (mask-free path) so the winner is
drop-in for models/swinir._window_attention.

Run ON TPU: python benchmarks/envelope_swin_attnmix.py
"""

import functools
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

NW = 1296      # windows per 288^2 tile
H = 6          # heads
N = 64         # tokens per window
HD = 30        # head dim
SCALE = HD ** -0.5


def v0_4d(q, k, v, bias):
    # q,k,v: (NW, H, N, HD) — the production layout
    s = jnp.einsum("bhnd,bhmd->bhnm", q * SCALE, k,
                   preferred_element_type=jnp.float32)
    s = s + bias[None]
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", a, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def v1_3d(q, k, v, bias):
    qf = q.reshape(NW * H, N, HD)
    kf = k.reshape(NW * H, N, HD)
    vf = v.reshape(NW * H, N, HD)
    bf = jnp.broadcast_to(bias[None], (NW, H, N, N)).reshape(NW * H, N, N)
    s = jnp.einsum("Bnd,Bmd->Bnm", qf * SCALE, kf,
                   preferred_element_type=jnp.float32) + bf
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("Bnm,Bmd->Bnd", a, vf,
                   preferred_element_type=jnp.float32)
    return o.reshape(NW, H, N, HD).astype(q.dtype)


def v2_pad32(q, k, v, bias):
    pad = ((0, 0), (0, 0), (0, 0), (0, 2))
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
    s = jnp.einsum("bhnd,bhmd->bhnm", qp * SCALE, kp,
                   preferred_element_type=jnp.float32) + bias[None]
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, vp,
                   preferred_element_type=jnp.float32)
    return o[..., :HD].astype(q.dtype)


def _pack(q, k, v, bias, g):
    # (NW, H, N, HD) -> (NW/g, H, g*N, HD); scores masked block-diagonal
    qg = q.reshape(NW // g, g, H, N, HD).transpose(0, 2, 1, 3, 4) \
          .reshape(NW // g, H, g * N, HD)
    kg = k.reshape(NW // g, g, H, N, HD).transpose(0, 2, 1, 3, 4) \
          .reshape(NW // g, H, g * N, HD)
    vg = v.reshape(NW // g, g, H, N, HD).transpose(0, 2, 1, 3, 4) \
          .reshape(NW // g, H, g * N, HD)
    blk = np.full((g * N, g * N), -1e9, np.float32)
    for i in range(g):
        blk[i * N:(i + 1) * N, i * N:(i + 1) * N] = 0.0
    bg = jnp.tile(jnp.asarray(bias), (1, g, g)) + blk
    s = jnp.einsum("bhnd,bhmd->bhnm", qg * SCALE, kg,
                   preferred_element_type=jnp.float32) + bg[None]
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, vg,
                   preferred_element_type=jnp.float32)
    o = o.reshape(NW // g, H, g, N, HD).transpose(0, 2, 1, 3, 4)
    return o.reshape(NW, H, N, HD).astype(q.dtype)


def v3_pack2(q, k, v, bias):
    return _pack(q, k, v, bias, 2)


def v4_pack4(q, k, v, bias):
    return _pack(q, k, v, bias, 4)


def v5_bf16s(q, k, v, bias):
    s = jnp.einsum("bhnd,bhmd->bhnm", q * SCALE, k,
                   preferred_element_type=jnp.bfloat16)
    s = s.astype(jnp.float32) + bias[None]
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", a, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


VARIANTS = {"v0_4d": v0_4d, "v1_3d": v1_3d, "v2_pad32": v2_pad32,
            "v3_pack2": v3_pack2, "v4_pack4": v4_pack4, "v5_bf16s": v5_bf16s}


@functools.partial(jax.jit, static_argnames=("name", "reps"))
def chain(q, k, v, bias, name, reps):
    fn = VARIANTS[name]

    def body(i, args):
        qq, acc = args
        o = fn(qq, k, v, bias)
        # feed the output back into the next query (tiny perturbation) so
        # the loop body is NOT loop-invariant — XLA would otherwise hoist
        # the whole mixing out of the fori and the slope would time nothing
        qq = (qq + o.astype(jnp.float32) * 1e-3).astype(qq.dtype)
        return (qq, acc + jnp.sum(jnp.abs(o).astype(jnp.float32)))

    _, acc = jax.lax.fori_loop(0, reps, body, (q, jnp.float32(0.0)))
    return acc


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 0.3, (NW, H, N, HD)),
                           jnp.bfloat16) for _ in range(3))
    bias = jnp.asarray(rng.normal(0, 0.1, (H, N, N)), jnp.float32)
    # correctness cross-check vs v0 first (f32 reference tolerances)
    ref = np.asarray(v0_4d(q, k, v, bias), np.float32)
    for name, fn in VARIANTS.items():
        got = np.asarray(fn(q, k, v, bias), np.float32)
        err = np.abs(got - ref).max()
        assert err < 0.05, (name, err)

    results = {}
    for name in VARIANTS:
        ts = {}
        for reps in (4, 16):
            float(chain(q, k, v, bias, name, reps))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(q, k, v, bias, name, reps))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        per = (ts[16] - ts[4]) / 12
        results[name] = per
        print(f"# {name:10s} {per*1e3:7.2f} ms/mixing  (one STL layer, "
              f"{NW}x{H} windows)", flush=True)
    base = results["v0_4d"]
    for name, t in results.items():
        print(f"{name}: {t*1e3:.2f} ms  ({base/t:.2f}x vs v0)")


if __name__ == "__main__":
    main()


# ---- full attention block (linears + mixing) in two formulations ----------

C = H * HD  # 180


def full_current(xw, wqkv, bqkv, wproj, bproj, bias):
    """models/swinir._window_attention as written: one qkv linear, 5-D
    transpose to (3, bn, H, n, hd), mixing, transpose back, proj."""
    bn, n, c = xw.shape
    qkv = (jnp.einsum("...i,io->...o", xw, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv).astype(xw.dtype)
    qkv = qkv.reshape(bn, n, 3, H, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q * SCALE, k,
                   preferred_element_type=jnp.float32) + bias[None]
    a = jax.nn.softmax(s, axis=-1).astype(xw.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(bn, n, c).astype(xw.dtype)
    return (jnp.einsum("...i,io->...o", o, wproj,
                       preferred_element_type=jnp.float32) + bproj)


def full_native(xw, wqkv, bqkv, wproj, bproj, bias):
    """Transpose-free: separate q/k/v projections, einsums consuming the
    (bn, n, H, hd) layout directly, output produced in (bn, n, H, hd)."""
    bn, n, c = xw.shape
    wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
    bq, bk, bv = bqkv[:C], bqkv[C:2 * C], bqkv[2 * C:]

    def proj(w, b):
        y = (jnp.einsum("...i,io->...o", xw, w,
                        preferred_element_type=jnp.float32) + b)
        return y.astype(xw.dtype).reshape(bn, n, H, HD)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    s = jnp.einsum("bnhd,bmhd->bhnm", q * SCALE, k,
                   preferred_element_type=jnp.float32) + bias[None]
    a = jax.nn.softmax(s, axis=-1).astype(xw.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", a, v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(bn, n, c).astype(xw.dtype)
    return (jnp.einsum("...i,io->...o", o, wproj,
                       preferred_element_type=jnp.float32) + bproj)


@functools.partial(jax.jit, static_argnames=("name", "reps"))
def chain_full(xw, wqkv, bqkv, wproj, bproj, bias, name, reps):
    fn = full_current if name == "current" else full_native

    def body(i, args):
        xx, acc = args
        o = fn(xx, wqkv, bqkv, wproj, bproj, bias)
        xx = (xx + o.astype(jnp.float32) * 1e-3).astype(xx.dtype)
        return (xx, acc + jnp.sum(jnp.abs(o).astype(jnp.float32)))

    _, acc = jax.lax.fori_loop(0, reps, body, (xw, jnp.float32(0.0)))
    return acc


def main_full():
    rng = np.random.default_rng(1)
    xw = jnp.asarray(rng.normal(0, 0.3, (NW, N, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(0, 0.02, (3 * C,)), jnp.float32)
    wproj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(0, 0.02, (C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (H, N, N)), jnp.float32)

    ref = np.asarray(full_current(xw, wqkv, bqkv, wproj, bproj, bias),
                     np.float32)
    got = np.asarray(full_native(xw, wqkv, bqkv, wproj, bproj, bias),
                     np.float32)
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()

    for name in ("current", "native"):
        ts = {}
        for reps in (4, 16):
            float(chain_full(xw, wqkv, bqkv, wproj, bproj, bias, name, reps))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain_full(xw, wqkv, bqkv, wproj, bproj, bias, name,
                                 reps))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        per = (ts[16] - ts[4]) / 12
        print(f"full_{name}: {per*1e3:.2f} ms per attention block",
              flush=True)


if __name__ == "__main__" and os.environ.get("NESR_SWIN_FULL") == "1":
    main_full()
