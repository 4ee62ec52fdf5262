"""Test configuration: force an 8-virtual-device CPU mesh before JAX imports.

This is the standard way to exercise `jax.sharding.Mesh` / `shard_map` code
without TPU hardware (SURVEY.md §4): every test sees 8 CPU devices, so the
multi-chip tiling/halo paths run under the same partitioner as on a real pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_image():
    """Small natural test image (RGB uint8), derived from the repo fixture."""
    from PIL import Image
    img = Image.open(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "test.jpeg")).convert("RGB")
    return np.asarray(img)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
