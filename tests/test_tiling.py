"""Tiling engine tests: tiled-vs-untiled equivalence and multi-device meshes.

Mirrors how the reference validates tiling only by a runtime probe
(SURVEY.md §4) — here it's a proper test: a conv-like model must produce
identical output tiled and untiled (away from borders), and the shard_map
paths must agree with the single-device path on an 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from neural_enhanced_super_resolution_tpu.parallel import (
    extract_tiles, make_mesh, pad_to_grid, process_strips_sharded,
    process_tiled, process_tiled_sharded, process_with_tiling_parity,
    stitch_tiles)


def _upscale2x_model(tiles):
    """A local conv + nearest-x2 upsample: halo-size-1 receptive field."""
    k = jnp.array([[0.05, 0.1, 0.05], [0.1, 0.4, 0.1], [0.05, 0.1, 0.05]],
                  jnp.float32)
    c = tiles.shape[-1]
    filt = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c))
    x = tiles.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = lax.conv_general_dilated(x, filt, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=c)
    n, h, w, cc = y.shape
    y = jnp.broadcast_to(y[:, :, None, :, None, :], (n, h, 2, w, 2, cc))
    return y.reshape(n, 2 * h, 2 * w, cc)


def test_extract_stitch_roundtrip(rng):
    img = jnp.asarray(rng.random((64, 96, 3), dtype=np.float32))
    tiles = extract_tiles(img, 32, 4)
    assert tiles.shape == (2 * 3, 40, 40, 3)
    back = stitch_tiles(tiles, 2, 3, 32, 4)
    assert np.allclose(np.asarray(back), np.asarray(img))


def test_process_tiled_matches_untiled(rng):
    img = rng.random((70, 90, 3), dtype=np.float32)
    whole = np.asarray(_upscale2x_model(jnp.asarray(img)[None])[0])
    tiled = np.asarray(process_tiled(_upscale2x_model, img, tile_size=32,
                                     halo=4, scale=2))
    assert tiled.shape == whole.shape
    # Interior must be exact; reflect-padded borders may differ within halo.
    assert np.allclose(tiled[8:-8, 8:-8], whole[8:-8, 8:-8], atol=1e-5)


def test_process_tiled_batched_chunks(rng):
    img = rng.random((64, 64, 3), dtype=np.float32)
    full = np.asarray(process_tiled(_upscale2x_model, img, 16, 2, 2))
    chunked = np.asarray(process_tiled(_upscale2x_model, img, 16, 2, 2,
                                       batch_tiles=3))
    assert np.allclose(full, chunked, atol=1e-6)


def test_process_tiled_bucketed_small_batch(rng):
    """A small image (6 tiles) with batch_tiles=16 runs an 8-tile bucket
    program, not a 16-padded one, and matches the unchunked result. The
    model asserts the bucket shape it actually sees."""
    seen = []

    def model(tiles):
        seen.append(int(tiles.shape[0]))
        return _upscale2x_model(tiles)

    img = rng.random((32, 48, 3), dtype=np.float32)        # 2x3 = 6 tiles
    full = np.asarray(process_tiled(_upscale2x_model, img, 16, 2, 2))
    bucketed = np.asarray(process_tiled(model, img, 16, 2, 2,
                                        batch_tiles=16))
    assert np.allclose(full, bucketed, atol=1e-6)
    assert seen == [8], seen  # pow2 bucket, not 16


def test_process_tiled_sharded_matches_single(rng):
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    img = rng.random((96, 96, 3), dtype=np.float32)
    single = np.asarray(process_tiled(_upscale2x_model, img, 16, 2, 2))
    sharded = np.asarray(process_tiled_sharded(_upscale2x_model, img, mesh,
                                               16, 2, 2))
    assert np.allclose(single, sharded, atol=1e-6)


def test_strip_sharding_halo_exchange(rng):
    mesh = make_mesh(8)
    img = rng.random((64, 48, 3), dtype=np.float32)
    whole = np.asarray(_upscale2x_model(jnp.asarray(img)[None])[0])
    strips = np.asarray(process_strips_sharded(_upscale2x_model, img, mesh,
                                               halo=4, scale=2))
    assert strips.shape == whole.shape
    # Interior strips got real neighbour rows via ppermute -> exact match
    # everywhere except the reflect-handled outer borders.
    assert np.allclose(strips[8:-8], whole[8:-8], atol=1e-5)


def test_parity_mode_matches_reference_arithmetic(rng):
    """Cross-check the parity tiler against the reference's own numpy code
    path semantics using a pure-numpy x2 processor."""
    img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)

    def proc(tile):
        return np.repeat(np.repeat(tile, 2, axis=0), 2, axis=1)

    out = process_with_tiling_parity(proc, img, upscale_factor=2,
                                     tile_size=32, padding=4)
    assert out.shape == (140, 180, 3)
    # Core region away from every tile seam must equal plain x2 repeat.
    ref = proc(img)
    assert np.array_equal(out[:60, :60], ref[:60, :60])


def test_parity_mode_probe_failure_falls_back_to_bicubic(rng):
    img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)

    def broken(tile):
        raise RuntimeError("model exploded")

    out = process_with_tiling_parity(broken, img, upscale_factor=2,
                                     tile_size=32, padding=4)
    assert out.shape == (140, 180, 3)
    assert out.any()  # bicubic fallback wrote every tile


def test_parity_mode_small_image_bypasses_tiling(rng):
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    calls = []

    def proc(tile):
        calls.append(tile.shape)
        return np.repeat(np.repeat(tile, 2, axis=0), 2, axis=1)

    out = process_with_tiling_parity(proc, img, 2, tile_size=32, padding=4)
    assert len(calls) == 1 and out.shape == (40, 40, 3)


def test_ensemble_members_sharded_matches_manual(rng):
    """EP-analog: members on mesh slots, psum-weighted average."""
    from neural_enhanced_super_resolution_tpu.parallel import (
        ensemble_members_sharded)
    mesh = make_mesh(8)
    img = rng.random((16, 16, 3), dtype=np.float32)
    # 8 members: scale the image by a per-member factor
    scales = np.linspace(0.5, 1.2, 8).astype(np.float32)
    stacked = {"s": jnp.asarray(scales).reshape(8, 1)}

    def model_fn(params, image):
        return image * params["s"][0]

    weights = np.asarray([1, 1, 1, 1, 2, 2, 2, 2], np.float32)
    weights = weights / weights.sum()
    out = np.asarray(ensemble_members_sharded(model_fn, stacked, img, mesh,
                                              weights=weights))
    ref = sum(w * s * img for w, s in zip(weights, scales))
    assert np.allclose(out, ref, atol=1e-6)


def test_process_tiled_halo_sufficiency(rng):
    """Any halo >= the model's receptive field gives identical tiled output.

    Demonstrates the mechanism on a toy model whose receptive field (1 px)
    the halos actually cover. NOTE: the production RRDBNet's receptive
    field is hundreds of pixels, so no practical halo covers it — the
    bench-geometry choice (halo 16 -> 10) is justified EMPIRICALLY by the
    tiled-vs-untiled PSNR sweep in benchmarks/RESULTS.md (identical at
    halo 6..16), not by this construction."""
    img = rng.random((70, 90, 3), dtype=np.float32)
    outs = [np.asarray(process_tiled(_upscale2x_model, img, tile_size=32,
                                     halo=h, scale=2)) for h in (2, 4, 8)]
    for o in outs[1:]:
        assert np.allclose(o[8:-8, 8:-8], outs[0][8:-8, 8:-8], atol=1e-5)


def test_process_tiled_to_host_matches_device_path(rng):
    """The streamed-to-host tiler must be bit-identical to
    np.asarray(process_tiled(...)) for both tail policies and for host-
    uint8 (native-staged) and device-array inputs."""
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        process_tiled, process_tiled_to_host)

    def model(tiles):  # x2 nearest upscale, content-dependent
        t = tiles.astype(jnp.float32)
        n, h, w, c = t.shape
        up = jnp.broadcast_to(t[:, :, None, :, None, :],
                              (n, h, 2, w, 2, c)).reshape(n, 2*h, 2*w, c)
        return (up % 251).astype(jnp.uint8)

    img = rng.integers(0, 256, (130, 98, 3), np.uint8)  # non-divisible dims
    for tail in ("bucket", "full"):
        want = np.asarray(process_tiled(model, jnp.asarray(img), tile_size=32,
                                        halo=4, scale=2, batch_tiles=4,
                                        tail=tail))
        for inp in (img, jnp.asarray(img)):
            got = process_tiled_to_host(model, inp, tile_size=32, halo=4,
                                        scale=2, batch_tiles=4, tail=tail,
                                        fetch_threads=3)
            assert isinstance(got, np.ndarray)
            np.testing.assert_array_equal(got, want)
