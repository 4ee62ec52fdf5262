"""Stage tracing & timing (SURVEY.md §5 "Tracing/profiling").

The reference only logs per-iteration wall clock (nesr.py:517, :632-633).
Here every pipeline stage gets a named jax.profiler annotation (visible in
TensorBoard/XProf traces on TPU) plus host-side wall-clock accumulation, and
throughput is reported in megapixels/sec.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger("nesr.profiler")

__all__ = ["StageTimer"]


class StageTimer:
    """Accumulates per-stage wall-clock and emits jax.profiler annotations."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        """Time a stage. JAX dispatch is async, so callers that want accurate
        attribution append the stage's output array to ``result_ref``; it is
        blocked on before the clock stops."""
        t0 = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(f"nesr/{name}"):
                yield
                if result_ref:
                    try:
                        jax.block_until_ready(result_ref[-1])
                    except Exception:  # non-array results time dispatch only
                        pass
        finally:
            # Record even when the stage raises: a failing stage that spent
            # a minute compiling must show up in the table, not vanish (the
            # round-4 config-5 artifact lost its diffusion/vae row exactly
            # this way — the VAE compile failure was swallowed upstream by
            # the pipeline's graceful-degradation ladder).
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug("stage %s: %.3fs", name, dt)

    def report(self) -> dict[str, float]:
        return dict(self.totals)

    def log_summary(self, megapixels_out: float | None = None):
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            logger.info("  %-16s %6.2fs (%d calls)", name, t, self.counts[name])
        if megapixels_out and total > 0:
            logger.info("  throughput: %.2f MP/s", megapixels_out / total)
