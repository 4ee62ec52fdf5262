"""Device & precision runtime (layer L1').

TPU-native counterpart of the reference's torch device logic
(_determine_device, /root/reference/nesr/nesr.py:86-132). The reference's
device vocabulary (cuda/mps/cpu) is accepted as aliases so configs and CLI
invocations written for the reference keep working: any accelerator request
resolves to TPU when one is present.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("nesr")

__all__ = ["determine_device", "default_compute_dtype", "accelerator_present",
           "enable_persistent_compilation_cache", "device_fetch"]

_cache_enabled = False


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes.

    Cold CLI runs on TPU otherwise pay minutes of compile latency per
    invocation (observed during end-to-end verification); with the persistent
    cache the second process reuses every executable. Opt out with
    NESR_NO_COMPILE_CACHE=1.
    """
    global _cache_enabled
    if _cache_enabled or os.environ.get("NESR_NO_COMPILE_CACHE"):
        return
    path = path or os.environ.get(
        "NESR_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "nesr-jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _cache_enabled = True
        logger.debug("persistent compilation cache at %s", path)
    except Exception as exc:  # pragma: no cover - best effort
        logger.debug("compilation cache unavailable: %s", exc)

def device_fetch(x, num_threads: int | None = None,
                 min_bytes: int = 16 << 20):
    """Device->host fetch of a large array via parallel row-chunk streams.

    A single np.asarray of a multi-hundred-MB output is the largest cost of
    the product pipeline on tunnel-attached TPUs (measured 23 MB/s whole vs
    31+ MB/s with 8 parallel chunk fetches — benchmarks/RESULTS.md round-4
    D2H study); on directly-attached hosts parallel fetches are neutral.
    Arrays below ``min_bytes`` (or with fewer rows than threads) take the
    plain path. The result is always a host numpy array equal to
    np.asarray(x).
    """
    import numpy as np

    x = jax.block_until_ready(x)
    nbytes = getattr(x, "nbytes", 0)
    if num_threads is None:
        num_threads = int(os.environ.get("NESR_FETCH_THREADS", "8"))
    if (nbytes < min_bytes or num_threads <= 1
            or getattr(x, "ndim", 0) < 1 or x.shape[0] < num_threads):
        return np.asarray(x)
    import concurrent.futures

    rows = x.shape[0]
    # Each in-flight chunk materialises x[a:a+step] as a fresh device buffer
    # before the copy, so peak extra HBM is num_threads * chunk_bytes. Cap
    # the chunk size (not just the count) so fetching a multi-hundred-MB
    # canvas never transiently doubles its HBM footprint.
    chunk_mb = int(os.environ.get("NESR_FETCH_CHUNK_MB", "32"))
    row_bytes = max(1, nbytes // rows)
    step = max(1, (chunk_mb << 20) // row_bytes)
    step = min(step, -(-rows // num_threads))
    out = np.empty(x.shape, dtype=x.dtype)

    def fetch(a):
        out[a:a + step] = np.asarray(x[a:a + step])

    with concurrent.futures.ThreadPoolExecutor(num_threads) as pool:
        list(pool.map(fetch, range(0, rows, step)))
    return out


_ACCEL_ALIASES = {"tpu", "cuda", "mps", "gpu"}


def accelerator_present() -> bool:
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def determine_device(requested: str = "auto") -> str:
    """Resolve a requested device string to 'tpu' or 'cpu'.

    auto -> tpu if an accelerator is visible, else cpu. cuda/mps/gpu are
    treated as requests for the accelerator (reference-compat aliases) and
    fall back to cpu with a warning when none is present
    (mirrors nesr.py:115-125's fallback chatter).
    """
    requested = (requested or "auto").lower()
    has_accel = accelerator_present()
    if requested == "auto":
        return "tpu" if has_accel else "cpu"
    if requested == "cpu":
        return "cpu"
    if requested in _ACCEL_ALIASES:
        if has_accel:
            if requested != "tpu":
                logger.info("Device '%s' requested; using TPU", requested)
            return "tpu"
        logger.warning("%s requested but no accelerator available, "
                       "falling back to CPU", requested.upper())
        return "cpu"
    logger.warning("Unknown device '%s', using auto selection", requested)
    return "tpu" if has_accel else "cpu"


def default_compute_dtype(device: str) -> str:
    """bf16 on TPU (MXU-native), f32 on CPU (parity/testing)."""
    return "bfloat16" if device == "tpu" else "float32"
