"""Native host runtime tests: C++ vs numpy/jax semantics."""

import numpy as np
import pytest

from neural_enhanced_super_resolution_tpu.runtime import native


def test_native_builds_and_loads():
    # The image has g++; the library must build and load.
    assert native.native_available()


def test_extract_tiles_matches_jax_path(rng):
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    out = native.extract_tiles_u8(img, tile=32, halo=4)
    assert out.shape == (6, 40, 40, 3)
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        extract_tiles)
    ref = np.asarray(extract_tiles(jnp.asarray(img), 32, 4))
    assert np.array_equal(out, ref)


def test_stitch_roundtrip(rng):
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    tiles = native.extract_tiles_u8(img, tile=32, halo=4)
    back = native.stitch_tiles_u8(tiles, 2, 2, 32, 4)
    assert np.array_equal(back, img)


def test_stack12_matches_reference_semantics(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    out = native.stack12_u8(img)
    assert out.shape == (40, 50, 12)
    bgr = img[..., ::-1].astype(np.float32) / 255.0
    assert np.allclose(out[..., 0:3], bgr, atol=1e-6)
    assert np.allclose(out[..., 3:6], np.minimum(bgr * 1.1, 1.0), atol=1e-6)
    assert np.allclose(out[..., 6:9], bgr * 0.9, atol=1e-6)
    # blurred variant: cv2.GaussianBlur((3,3), 0) on uint8 BGR then /255
    ref_blur = cv2.GaussianBlur(np.ascontiguousarray(img[..., ::-1]),
                                (3, 3), 0).astype(np.float32) / 255.0
    diff = np.abs(out[..., 9:12] - ref_blur) * 255.0
    assert diff.max() <= 1.0  # fixed-point rounding difference at most 1


def test_numpy_fallback_matches_native(rng, monkeypatch):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    native_out = native.stack12_u8(img)
    tiles_native = native.extract_tiles_u8(img, 16, 2)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    fallback_out = native.stack12_u8(img)
    tiles_fallback = native.extract_tiles_u8(img, 16, 2)
    assert np.allclose(native_out, fallback_out, atol=1e-6)
    assert np.array_equal(tiles_native, tiles_fallback)
