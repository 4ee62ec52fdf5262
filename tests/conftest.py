"""Test configuration: force an 8-virtual-device CPU mesh before JAX imports.

This is the standard way to exercise `jax.sharding.Mesh` / `shard_map` code
without TPU hardware (SURVEY.md §4): every test sees 8 CPU devices, so the
multi-chip tiling/halo paths run under the same partitioner as on a real pod.
"""

import os

# Explicit override: the environment presets JAX_PLATFORMS to the TPU platform
# (and a sitecustomize may re-force it), so use jax.config — which wins over
# env — to pin tests to an 8-virtual-device CPU mesh.
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("NESR_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)

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
