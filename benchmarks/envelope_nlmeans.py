#!/usr/bin/env python3
"""NL-means formulation envelope (round 4: attack the ~2 MP/s denoise wall).

The production `_nl_means_f32` (ops/nlmeans.py) measured 132 ms per 512^2
colored tile (~2 MP/s) — ~30x off an HBM-roofline estimate (~4 ms: 441
offsets x ~6 MB of f32 traffic each at ~650 GB/s). Two suspects, both
isolated here:

  1. the column offsets run as `vmap(lambda dx: dynamic_slice(ext, (dy,dx,0),
     ...))` — vmapping a dynamic_slice over traced starts lowers to a batched
     GATHER, not 21 cheap slices;
  2. the 7x7 box sum runs as an integral image (two full-array cumsums per
     offset) — log-depth shift passes over the padded array where a direct
     7-tap shift-add needs 12 adds.

Variants (all value-equivalent up to f32 association):
  v0_current    scan rows + vmap(dyn-slice) cols + cumsum box   (production)
  v1_static     scan rows (1 dyn-slice/row-slab) + 21 static col slices
                + shift-add box
  v2_cumsum     v1's slicing, v0's cumsum box      (isolates the box sum)
  v3_gather     v0's vmap cols, v1's shift-add box (isolates the gather)

Timing: jitted fori_loop of `steps` chained denoises (output fed back so
nothing hoists), slope-timed HI-vs-LO so dispatch noise cancels — the same
discipline as envelope_unet_batch.py. Run ON TPU:
    python benchmarks/envelope_nlmeans.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

SIZE = int(os.environ.get("NESR_NLM_ENV_SIZE", "512"))
CHANNELS = 3
HI, LO = 8, 2
TEMPLATE, SEARCH = 7, 21


def _box_cumsum(x, k):
    ii = jnp.pad(x, ((1, 0), (1, 0)))
    ii = jnp.cumsum(jnp.cumsum(ii, axis=0), axis=1)
    return ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]


def _box_shift(x, k):
    """k x k VALID windowed sum via 2(k-1) static-slice adds."""
    h, w = x.shape
    acc = x[: h - k + 1]
    for i in range(1, k):
        acc = acc + x[i : h - k + 1 + i]
    out = acc[:, : w - k + 1]
    for j in range(1, k):
        out = out + acc[:, j : w - k + 1 + j]
    return out


def _make_variant(col_mode: str, box_mode: str):
    box = _box_shift if box_mode == "shift" else _box_cumsum

    @jax.jit
    def nlm(img, h, sigma):
        H, W, C = img.shape
        tr, sr = TEMPLATE // 2, SEARCH // 2
        pad = sr + tr
        ext = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        center = lax.slice(ext, (sr, sr, 0),
                           (sr + H + 2 * tr, sr + W + 2 * tr, C))
        t_area = float(TEMPLATE * TEMPLATE * C)
        inv_h2 = 1.0 / (h * h)
        two_sigma2 = 2.0 * sigma * sigma

        def accum(num, den, shifted):
            d2 = jnp.sum((center - shifted) ** 2, axis=-1)
            dist = box(d2, TEMPLATE) / t_area
            wgt = jnp.exp(-jnp.maximum(dist - two_sigma2, 0.0) * inv_h2)
            s_center = lax.slice(shifted, (tr, tr, 0), (tr + H, tr + W, C))
            return num + wgt[:, :, None] * s_center, den + wgt

        def row_step(carry, dy):
            num, den = carry
            if col_mode == "static":
                slab = lax.dynamic_slice(
                    ext, (dy, 0, 0), (H + 2 * tr, W + 2 * pad, C))
                for dx in range(SEARCH):
                    shifted = lax.slice(slab, (0, dx, 0),
                                        (H + 2 * tr, dx + W + 2 * tr, C))
                    num, den = accum(num, den, shifted)
            else:  # "gather": the production vmap over traced dx
                def one(dx):
                    shifted = lax.dynamic_slice(
                        ext, (dy, dx, 0), (H + 2 * tr, W + 2 * tr, C))
                    d2 = jnp.sum((center - shifted) ** 2, axis=-1)
                    dist = box(d2, TEMPLATE) / t_area
                    wgt = jnp.exp(
                        -jnp.maximum(dist - two_sigma2, 0.0) * inv_h2)
                    s_center = lax.slice(shifted, (tr, tr, 0),
                                         (tr + H, tr + W, C))
                    return wgt[:, :, None] * s_center, wgt
                nums, wgts = jax.vmap(one)(
                    jnp.arange(SEARCH, dtype=jnp.int32))
                num = num + jnp.sum(nums, axis=0)
                den = den + jnp.sum(wgts, axis=0)
            return (num, den), None

        init = (jnp.zeros((H, W, C), jnp.float32),
                jnp.zeros((H, W), jnp.float32))
        (num, den), _ = lax.scan(row_step, init,
                                 jnp.arange(SEARCH, dtype=jnp.int32))
        return num / den[:, :, None]

    return nlm


VARIANTS = {
    "v0_current": ("gather", "cumsum"),
    "v1_static": ("static", "shift"),
    "v2_cumsum": ("static", "cumsum"),
    "v3_gather": ("gather", "shift"),
}


def time_variant(name, col_mode, box_mode, ref_out=None):
    nlm = _make_variant(col_mode, box_mode)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def loop(img, steps):
        def body(i, x):
            out = nlm(x, jnp.float32(5.0), jnp.float32(0.0))
            # feed back, renormalized so values stay in range (data-dependent
            # chain: nothing hoists out of the loop)
            return 0.9 * x + 0.1 * out

        return lax.fori_loop(0, steps, body, img)

    key = jax.random.PRNGKey(0)
    img = (jax.random.uniform(key, (SIZE, SIZE, CHANNELS), jnp.float32)
           * 255.0)

    # correctness cross-check between variants (single application)
    out1 = nlm(img, jnp.float32(5.0), jnp.float32(0.0))
    out1.block_until_ready()
    if ref_out is not None:
        err = float(jnp.max(jnp.abs(out1 - ref_out)))
        assert err < 1e-2, f"{name}: variant disagrees with v0 by {err}"

    def run(steps):
        out = loop(img, steps)
        return float(jnp.sum(out[:1, :1]))  # force a fetch

    run(HI)
    run(LO)
    slopes = []
    for _ in range(4):
        t0 = time.perf_counter()
        run(HI)
        thi = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(LO)
        tlo = time.perf_counter() - t0
        if thi > tlo:
            slopes.append((thi - tlo) / (HI - LO))
    best = min(slopes) if slopes else float("nan")
    mp_s = SIZE * SIZE / 1e6 / best if best == best else float("nan")
    print(f"{name:12s} per-call {best*1e3:8.2f} ms  ({mp_s:6.2f} MP/s)  "
          f"slopes {[round(s*1e3, 1) for s in slopes]}", flush=True)
    return out1


def main():
    print(f"NL-means envelope: {SIZE}^2 x{CHANNELS} f32, "
          f"template {TEMPLATE}, search {SEARCH}, "
          f"slope {HI}-vs-{LO} chained calls "
          f"[{jax.devices()[0].platform}]", flush=True)
    ref = None
    for name, (col, box) in VARIANTS.items():
        out = time_variant(name, col, box, ref_out=ref)
        if name == "v0_current":
            ref = out


if __name__ == "__main__":
    main()
