"""Runtime layer tests: config merge semantics, device policy, profiler."""

import numpy as np
import pytest

from neural_enhanced_super_resolution_tpu.runtime.config import (
    default_config, merge_config)
from neural_enhanced_super_resolution_tpu.runtime.device import (
    default_compute_dtype, determine_device)
from neural_enhanced_super_resolution_tpu.runtime.profiler import StageTimer


def test_defaults_match_reference_keys():
    cfg = default_config()
    # Reference defaults (nesr.py:33-65)
    assert cfg["iterations"] == 3
    assert cfg["use_diffusion"] and cfg["use_esrgan"]
    assert cfg["use_swinir"] is False
    assert cfg["denoise_level"] == 0.5
    assert cfg["upscale_factor"] == 2
    assert cfg["max_tile_size"] == 512
    assert cfg["output_dir"] == "outputs"
    assert "device_specific" in cfg
    assert cfg["device_specific"]["mps"]["force_3channel"] is True


def test_device_overlay_fills_unset_keys():
    cfg = merge_config("cpu", {})
    assert cfg["max_megapixels"] == 2  # cpu overlay


def test_user_keys_beat_device_overlay():
    # Mirrors nesr.py:72-77: only keys the user didn't set are overlaid.
    cfg = merge_config("cpu", {"max_megapixels": 99})
    assert cfg["max_megapixels"] == 99


def test_none_config_is_safe():
    # The reference crashes on config=None at the overlay (nesr.py:76).
    cfg = merge_config("cpu", None)
    assert cfg["iterations"] == 3


def test_determine_device_aliases():
    assert determine_device("cpu") == "cpu"
    assert determine_device("auto") in ("tpu", "cpu")
    # accelerator aliases never raise
    for alias in ("cuda", "mps", "gpu", "tpu"):
        assert determine_device(alias) in ("tpu", "cpu")
    assert determine_device("bogus") in ("tpu", "cpu")


def test_compute_dtype_policy():
    assert default_compute_dtype("tpu") == "bfloat16"
    assert default_compute_dtype("cpu") == "float32"


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert set(t.report()) == {"a", "b"}


def test_executor_close_after_abandoned_iteration():
    """Abandoning map_paths early must not deadlock close() or leak the
    staging thread blocked on the bounded queue (ADVICE round 1)."""
    import threading
    import time

    from neural_enhanced_super_resolution_tpu.runtime.executor import (
        BatchExecutor)

    class _FakePipeline:
        def enhance_array(self, img, prompt=None):
            return img

    n_before = threading.active_count()
    ex = BatchExecutor(_FakePipeline(), prefetch=1,
                       loader=lambda p: np.zeros((4, 4, 3), np.uint8))
    it = ex.map_paths([f"img{i}" for i in range(50)])
    next(it)  # consume one, then abandon: staging thread blocks on put()
    t0 = time.time()
    ex.close()
    assert time.time() - t0 < 3.0, "close() hung"
    deadline = time.time() + 2.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before, "staging thread leaked"


def test_device_fetch_matches_asarray():
    """Chunked parallel D2H (runtime/device.device_fetch) must be
    byte-identical to np.asarray across shapes, dtypes, and row counts
    that don't divide the thread count."""
    import numpy as np
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.runtime.device import (
        device_fetch)

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 256, (37, 19, 3), np.uint8),     # small: plain path
        rng.integers(0, 256, (1037, 513, 3), np.uint8),  # odd rows
        rng.normal(size=(64, 64)).astype(np.float32),
        rng.integers(0, 2, (9,)).astype(np.int32),       # 1-D, fewer rows
    ]
    for host in cases:
        dev = jnp.asarray(host)
        np.testing.assert_array_equal(device_fetch(dev, min_bytes=0), host)
        np.testing.assert_array_equal(
            device_fetch(dev, num_threads=3, min_bytes=0), host)
