#!/usr/bin/env python3
"""Weak-scaling curve for the sharded modes on the virtual CPU mesh
(VERDICT round 4 #8).

Correctness of the multi-chip paths is proven elsewhere (equality tests,
the driver dryrun, the two-process DCN test); this script quantifies the
SCALING SHAPE: workload grows proportionally with the device count
(weak scaling) over meshes of 1/2/4/8 virtual CPU devices, for both
sharded modes (tile-DP and row strips with ppermute halo exchange).

Reading the numbers: this host is a single CPU core, so the n virtual
devices SERIALIZE compute — ideal weak scaling here is t(n) = n * t(1),
not t(n) = t(1). The reported `overhead = t(n) / (n * t(1))` is therefore
the per-device dispatch/stitch/collective overhead factor: ~1.0 means the
sharded machinery adds nothing beyond the work itself; >> 1 means a
serialization bug (e.g. every device secretly processing the full batch
would give overhead ~ n). It will NOT show TPU speedups — that needs real
chips; what it catches is the bug class equality tests can't see.

tests/test_distributed.py::test_weak_scaling_overhead_bounded asserts the
bound in CI (n=8 vs n=1, overhead < 2.5).

Run: python benchmarks/scaling_cpu_mesh.py   (forces CPU, 8 virtual devices)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force_cpu(n: int = 8) -> None:
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        pass  # backend already initialised (e.g. under pytest conftest)
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) >= n, (
        "re-run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n}")


def measure(mode: str, n: int, rows_per_dev: int = 64, width: int = 256,
            reps: int = 3) -> float:
    """Best-of wall-clock for one weak-scaled run of ``mode`` on n devices.

    Workload: a (rows_per_dev * n, width) uint8 image through the tiny
    RRDBNet (feat 8 / block 2), tile 64 halo 4 for tiles-DP, halo 4 for
    strips — rows grow with n, per-device work constant.
    """
    import jax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, init_rrdbnet)
    from neural_enhanced_super_resolution_tpu.parallel.mesh import make_mesh
    from neural_enhanced_super_resolution_tpu.parallel.sharded import (
        process_strips_sharded, process_tiled_sharded)
    from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                        num_block=2, num_grow_ch=4)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n)
    img = np.random.default_rng(0).integers(
        0, 256, (rows_per_dev * n, width, 3), dtype=np.uint8)

    def model_fn(tiles):
        return _esrgan_jit(params, tiles, cfg, "float32", "stack12")

    def run():
        if mode == "tiles":
            out = process_tiled_sharded(model_fn, img, mesh, tile_size=64,
                                        halo=4, scale=4)
        else:
            import jax.numpy as jnp
            out = process_strips_sharded(
                lambda x: model_fn(x.astype(jnp.uint8)), jnp.asarray(img),
                mesh, halo=4, scale=4)
        return jax.block_until_ready(out)

    out = run()  # compile + warm
    assert out.shape == (rows_per_dev * n * 4, width * 4, 3), out.shape
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    _force_cpu(8)
    ns = [int(s) for s in os.environ.get("NESR_SCALE_NS", "1,2,4,8")
          .split(",")]
    ok = True
    for mode in ("tiles", "strips"):
        t1 = None
        for n in ns:
            t = measure(mode, n)
            if t1 is None:
                t1 = t / n  # per-device-unit baseline at the smallest n
            overhead = t / (n * t1)
            line = {"mode": mode, "devices": n, "seconds": round(t, 3),
                    "overhead_vs_linear": round(overhead, 2)}
            print(json.dumps(line), flush=True)
            ok = ok and overhead < 2.5
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
