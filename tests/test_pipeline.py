"""Pipeline integration tests (SURVEY.md §4: degrade->enhance round trips).

Uses a tiny randomly-initialised RRDBNet checkpoint (esrgan_arch override) so
the full ladder runs without the 67 MB published weights; quality assertions
use the real weights path only when present.
"""

import os

import numpy as np
import pytest
import torch

from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
from neural_enhanced_super_resolution_tpu.models import (
    RRDBNetConfig, init_rrdbnet)
from neural_enhanced_super_resolution_tpu.utils import (
    add_noise, downsample_image, psnr)


TINY_ARCH = dict(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                 num_block=2, num_grow_ch=4)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A tiny .pth checkpoint in basicsr layout (via our torch-free mapping)."""
    import jax
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        init_rrdbnet, RRDBNetConfig)
    cfg = RRDBNetConfig(**TINY_ARCH)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)

    sd = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr",
                 "conv_last"):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(params[name]["w"]).transpose(3, 2, 0, 1).copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(params[name]["b"]))
    for i in range(cfg.num_block):
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for ci in range(1, 6):
                p = params["body"][rdb][f"conv{ci}"]
                sd[f"body.{i}.{rdb}.conv{ci}.weight"] = torch.from_numpy(
                    np.asarray(p["w"][i]).transpose(3, 2, 0, 1).copy())
                sd[f"body.{i}.{rdb}.conv{ci}.bias"] = torch.from_numpy(
                    np.asarray(p["b"][i]))
    path = tmp_path_factory.mktemp("ckpt") / "tiny_esrgan.pth"
    torch.save({"params_ema": sd}, str(path))
    return str(path)


def _mk_pipeline(tmp_path, tiny_ckpt, **overrides):
    cfg = {
        "iterations": 1,
        "use_diffusion": False,
        "segment_enhancement": False,
        "denoise_level": 0,           # skip NL-means: keeps tests fast
        "output_dir": str(tmp_path / "out"),
        "esrgan_model_path": tiny_ckpt,
        "esrgan_arch": dict(TINY_ARCH),
    }
    cfg.update(overrides)
    return SuperResolutionPipeline(device="cpu", config=cfg)


def test_enhance_image_end_to_end(tmp_path, tiny_ckpt, test_image):
    from neural_enhanced_super_resolution_tpu.utils.io import imwrite_rgb
    src = str(tmp_path / "input.png")
    imwrite_rgb(src, test_image[:64, :64])

    pipe = _mk_pipeline(tmp_path, tiny_ckpt)
    out_path = pipe.enhance_image(src)
    # 12ch mode is x4 per iteration; naming matches the reference contract.
    assert os.path.basename(out_path) == "input_enhanced_x4.0.png"
    from neural_enhanced_super_resolution_tpu.utils.io import imread_rgb
    out = imread_rgb(out_path)
    assert out.shape == (256, 256, 3)


def test_progress_callbacks_fire_with_reference_stages(tmp_path, tiny_ckpt,
                                                       test_image):
    stages = []

    def cb(stage, iteration, total, message):
        stages.append(stage)

    pipe = _mk_pipeline(tmp_path, tiny_ckpt, progress_callback=cb)
    pipe.enhance_array(test_image[:32, :32])
    assert stages[0] == "Enhancement"
    for s in ("Preprocessing", "ESRGAN", "Ensemble", "Postprocessing"):
        assert s in stages


def test_no_models_falls_back_to_bicubic(tmp_path, test_image):
    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False, "use_esrgan": False,
        "segment_enhancement": False, "denoise_level": 0,
        "adaptive_sharpening": False,
        "output_dir": str(tmp_path / "out")})
    out = pipe.enhance_array(test_image[:40, :40])
    # Bicubic floor of the ladder: x2 (upscale_factor), not x4.
    assert out.shape == (80, 80, 3)


def test_missing_weights_disable_esrgan_not_crash(tmp_path, test_image):
    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "denoise_level": 0,
        "esrgan_model_path": str(tmp_path / "nonexistent.pth"),
        "output_dir": str(tmp_path / "out")})
    out = pipe.enhance_array(test_image[:40, :40])
    assert out.shape == (80, 80, 3)  # ladder: bicubic fallback


def test_intermediate_saves(tmp_path, tiny_ckpt, test_image):
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, intermediate_saves=True,
                        iterations=1)
    pipe.enhance_array(test_image[:32, :32])
    assert os.path.exists(str(tmp_path / "out" / "intermediate_iter1.png"))


def test_tiled_matches_untiled_quality(tmp_path, tiny_ckpt, test_image):
    img = test_image[:96, :96]
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False)
    whole = pipe.enhance_array(img)

    pipe_tiled = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                              enable_tiling=True, max_megapixels=0.001,
                              max_tile_size=48)
    tiled = pipe_tiled.enhance_array(img)
    # Tiled output lands on the 2x canvas (reference geometry); compare
    # against the 4x whole-image result downscaled to the same grid.
    assert tiled.shape[0] == img.shape[0] * 2
    from neural_enhanced_super_resolution_tpu.ops.resize import resize
    whole2 = np.asarray(resize(whole, dsize=(tiled.shape[1], tiled.shape[0]),
                               interpolation="lanczos4"))
    assert float(psnr(tiled, whole2)) > 30.0


def test_data_parallel_auto_matches_off(tmp_path, tiny_ckpt, test_image):
    """VERDICT round 2 #2: multi-device execution must be reachable from the
    product entry point. On the 8-virtual-device mesh, enhance_array with
    data_parallel="auto" (tile batch sharded over the mesh) must equal the
    single-device path bit-for-bit."""
    import jax
    assert jax.device_count() >= 8  # conftest virtual mesh
    img = test_image[:96, :96]
    kw = dict(adaptive_sharpening=False, enable_tiling=True,
              max_megapixels=0.001, max_tile_size=48)
    out_off = _mk_pipeline(tmp_path, tiny_ckpt, data_parallel="off",
                           **kw).enhance_array(img)
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, data_parallel="auto", **kw)
    out_auto = pipe.enhance_array(img)
    assert pipe._parallel_layout()["mesh"] is not None  # DP actually engaged
    assert out_auto.shape == out_off.shape
    assert np.array_equal(out_auto, out_off)


def test_sharded_failure_degrades_to_single_device(tmp_path, tiny_ckpt,
                                                   test_image, monkeypatch):
    """A failing sharded dispatch ladders to the single-device tile path —
    but cancellation must NOT be swallowed by that rung."""
    from neural_enhanced_super_resolution_tpu.parallel import sharded

    def boom(*a, **k):
        raise RuntimeError("injected sharded failure")

    monkeypatch.setattr(sharded, "process_tiled_sharded", boom)
    img = test_image[:96, :96]
    kw = dict(adaptive_sharpening=False, enable_tiling=True,
              max_megapixels=0.001, max_tile_size=48)
    out = _mk_pipeline(tmp_path, tiny_ckpt, data_parallel="auto",
                       **kw).enhance_array(img)
    ref = _mk_pipeline(tmp_path, tiny_ckpt, data_parallel="off",
                       **kw).enhance_array(img)
    assert np.array_equal(out, ref)


def test_strip_sharding_through_product(tmp_path, tiny_ckpt, test_image):
    """VERDICT round 3 #6: shard_strategy="strips" routes enhance_array's
    upscale through process_strips_sharded (SP/CP with ICI ppermute halos)
    and agrees with the tile-DP path.

    Why a 30 dB floor and not exactness: at this geometry the model's
    receptive field (~35 input px for the 2-block net) exceeds the 8-px
    halo, so the TILE path truncates real context at every 48-px column
    seam while strips keep full-width context — the paths legitimately
    differ near every seam (measured up to ~100 uint8 levels with random
    weights) and nothing tighter than a global floor holds between them.
    The sharp strips contract is pinned separately by
    test_strip_sharding_interior_exact_vs_whole below: at halo >= RF the
    strip interior is BIT-EXACT against the untiled whole-image forward."""
    import jax
    assert jax.device_count() >= 8
    img = test_image[:128, :128]
    kw = dict(adaptive_sharpening=False, enable_tiling=True,
              max_megapixels=0.001, max_tile_size=48, tile_halo=8,
              data_parallel="auto")
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="strips", **kw)
    out_strips = pipe.enhance_array(img)
    assert pipe._parallel_layout()["mesh"] is not None
    out_tiles = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="tiles",
                             **kw).enhance_array(img)
    assert out_strips.shape == out_tiles.shape
    assert float(psnr(out_strips, out_tiles)) > 30.0


def test_strip_sharding_interior_exact_vs_whole(tmp_path, tiny_ckpt,
                                                test_image):
    """VERDICT round 4 #7: the strips product path, at halo >= receptive
    field, must be BIT-EXACT against the untiled whole-image product run
    everywhere except the top/bottom border band (where strips reflect the
    image edge while the un-tiled conv zero-pads — a border-policy
    difference, not a stitching error). A ppermute off-by-one or halo-crop
    bug corrupts interior seam rows and fails the exact assertion; the
    PSNR-level strips-vs-tiles test above cannot see that class of bug.

    Geometry: 320x128 input over the 8-device mesh = 40-row strips,
    halo 36 >= the 2-block net's ~35 px receptive field (40 > halo+1, so
    the exchange is legal); upscale_factor=4.0 keeps the x4 model output
    un-resized so rounding can't smear the comparison; denoise/contrast
    off so preprocess is identity for both runs."""
    img = np.asarray(np.tile(test_image, (2, 1, 1)))[:320, :128]
    kw = dict(adaptive_sharpening=False, upscale_factor=4.0,
              denoise_level=0, contrast_enhancement=False)
    whole = _mk_pipeline(tmp_path, tiny_ckpt, enable_tiling=False,
                         data_parallel="off", **kw).enhance_array(img)
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="strips",
                        enable_tiling=True, max_megapixels=0.001,
                        max_tile_size=64, tile_halo=36,
                        data_parallel="auto", **kw)
    strips = pipe.enhance_array(img)
    assert pipe._parallel_layout()["mesh"] is not None
    assert strips.shape == whole.shape == (1280, 512, 3)
    border = 4 * 40  # 40 input rows * scale; measured band is ~32 rows
    np.testing.assert_array_equal(strips[border:-border],
                                  whole[border:-border])
    # the border band itself is bounded (reflect-vs-zero-pad divergence
    # decays within the receptive field; a stitch bug would exceed this)
    assert float(psnr(strips, whole)) > 30.0


def test_strip_sharding_too_thin_uses_tiles(tmp_path, tiny_ckpt, test_image):
    """Strips thinner than the halo can't halo-exchange; the dispatch must
    fall back to tile sharding, not crash."""
    img = test_image[:64, :64]  # 8 rows/chip on the 8-device mesh < halo 16
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="strips",
                        adaptive_sharpening=False, enable_tiling=True,
                        max_megapixels=0.001, max_tile_size=48, tile_halo=16,
                        data_parallel="auto")
    out = pipe.enhance_array(img)
    ref = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="tiles",
                       adaptive_sharpening=False, enable_tiling=True,
                       max_megapixels=0.001, max_tile_size=48, tile_halo=16,
                       data_parallel="auto").enhance_array(img)
    assert np.array_equal(out, ref)


def test_strip_sharding_exact_halo_rows_uses_guard(tmp_path, tiny_ckpt,
                                                   test_image, caplog):
    """rows/chip == halo must be caught by the host-side guard (the halo
    exchange reflects strip[1:halo+1], needing rows >= halo + 1), not by a
    trace failure inside shard_map that silently degrades to tiles."""
    import logging
    img = test_image[:128, :128]  # 16 rows/chip over 8 devices == halo 16
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="strips",
                        adaptive_sharpening=False, enable_tiling=True,
                        max_megapixels=0.001, max_tile_size=48, tile_halo=16,
                        data_parallel="auto")
    with caplog.at_level(logging.WARNING, logger="nesr"):
        out = pipe.enhance_array(img)
    ref = _mk_pipeline(tmp_path, tiny_ckpt, shard_strategy="tiles",
                       adaptive_sharpening=False, enable_tiling=True,
                       max_megapixels=0.001, max_tile_size=48, tile_halo=16,
                       data_parallel="auto").enhance_array(img)
    assert np.array_equal(out, ref)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("thinner than" in m for m in msgs)
    assert not any("Strip-sharded path failed" in m for m in msgs)


def test_parallel_layout_splits_for_diffusion_overlap(tmp_path, tiny_ckpt):
    """With use_diffusion + stage_overlap on a multi-device host, the layout
    reserves a remainder device for the denoise loop (real stage overlap)."""
    import jax
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, use_diffusion=True)
    layout = pipe._parallel_layout()
    assert layout["mesh"] is not None
    assert layout["diffusion_device"] is not None
    mesh_devs = set(d.id for d in layout["mesh"].devices.flat)
    assert layout["diffusion_device"].id not in mesh_devs
    assert len(mesh_devs) + 1 <= jax.device_count()

    # data_parallel="off" keeps the single-device layout
    pipe_off = _mk_pipeline(tmp_path, tiny_ckpt, data_parallel="off")
    assert pipe_off._parallel_layout() == {"mesh": None,
                                           "diffusion_device": None}


def test_cancel_mid_tile_sweep(tmp_path, tiny_ckpt, test_image):
    """config["cancel_check"] interrupts a tile sweep at a chunk boundary
    and propagates EnhancementCancelled past the fallback ladder
    (VERDICT round 2, Missing #3)."""
    from neural_enhanced_super_resolution_tpu.pipeline import (
        EnhancementCancelled)

    calls = {"n": 0}

    def cancel_after_two():
        calls["n"] += 1
        return calls["n"] > 2

    pipe = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                        enable_tiling=True, max_megapixels=0.001,
                        max_tile_size=24, tile_batch=2, tile_halo=4,
                        data_parallel="off",
                        cancel_check=cancel_after_two)
    with pytest.raises(EnhancementCancelled):
        pipe.enhance_array(test_image[:96, :96])
    assert calls["n"] > 2  # polled repeatedly, fired mid-sweep


def test_config_none_does_not_crash():
    # The reference crashes when config=None reaches the device overlay
    # (nesr.py:76); we accept it (SURVEY.md §7 reference bugs).
    pipe = SuperResolutionPipeline(device="cpu", config=None)
    assert pipe.config["iterations"] == 3


def test_device_aliases():
    p = SuperResolutionPipeline(device="cuda", config={"output_dir": "outputs"})
    assert p.device in ("tpu", "cpu")


def test_x2plus_variant(tmp_path, test_image):
    """esrgan_variant='x2plus': published 3-channel pixel-unshuffle semantics
    (2x per iteration instead of the 12ch quirk's 4x)."""
    import jax
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, init_rrdbnet)
    arch = dict(num_in_ch=3, num_out_ch=3, scale=2, num_feat=8, num_block=2,
                num_grow_ch=4)
    cfg = RRDBNetConfig(**arch)
    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False, "segment_enhancement": False,
        "denoise_level": 0, "adaptive_sharpening": False,
        "esrgan_variant": "x2plus", "esrgan_arch": arch,
        "output_dir": str(tmp_path / "out")})
    # inject tiny weights directly (checkpoint path covered elsewhere)
    pipe.models["esrgan"] = {
        "params": init_rrdbnet(jax.random.PRNGKey(0), cfg), "cfg": cfg}
    src = test_image[:33, :41]
    out = pipe.enhance_array(src)  # odd dims: pad path
    assert out.shape == (66, 82, 3)
    # The model must actually have run — bicubic fallback (same shape)
    # would mean the x2plus forward crashed and the ladder swallowed it.
    from neural_enhanced_super_resolution_tpu.ops.resize import resize
    bicubic = np.asarray(resize(src, dsize=(82, 66),
                                interpolation="bicubic"))
    assert np.abs(out.astype(int) - bicubic.astype(int)).mean() > 2.0


def test_parity_tiling_mode_through_pipeline(tmp_path, tiny_ckpt, test_image):
    """parity_tiling=True routes through the reference-exact stitch
    arithmetic (host tile loop) and still produces the 2x canvas."""
    img = test_image[:96, :96]
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                        enable_tiling=True, max_megapixels=0.001,
                        max_tile_size=48, parity_tiling=True)
    out = pipe.enhance_array(img)
    assert out.shape == (192, 192, 3)
    # compare against the fast tiled path: same canvas, similar content
    pipe_fast = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                             enable_tiling=True, max_megapixels=0.001,
                             max_tile_size=48, parity_tiling=False)
    fast = pipe_fast.enhance_array(img)
    assert fast.shape == out.shape
    assert float(psnr(out, fast)) > 20.0  # halo handling differs only at seams


def test_fallback_ladder_reaches_tiled_3ch(tiny_ckpt, test_image, monkeypatch):
    """From an untiled-12ch failure, the ladder must try 3ch, then
    tiled-3ch(256), then bicubic — every rung reachable (VERDICT #6a;
    reference nesr.py:815-843)."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(config={
        "esrgan_model_path": tiny_ckpt,
        "esrgan_arch": dict(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                            num_block=2, num_grow_ch=4),
        "use_diffusion": False, "segment_enhancement": False})
    pipe._load_models()
    calls = []

    def fail_12ch(image):
        calls.append("12ch")
        raise RuntimeError("boom-12ch")

    def fail_3ch(image):
        calls.append("3ch")
        raise RuntimeError("boom-3ch")

    def tiled_ok(image, three_channel, tile_size, padding):
        calls.append(("tiled", three_channel, tile_size, padding))
        return jnp.zeros((image.shape[0] * 4, image.shape[1] * 4, 3),
                         jnp.uint8)

    monkeypatch.setattr(pipe, "_apply_esrgan_12channel", fail_12ch)
    monkeypatch.setattr(pipe, "_apply_esrgan_3channel", fail_3ch)
    monkeypatch.setattr(pipe, "_esrgan_tiled", tiled_ok)
    out = pipe._apply_esrgan(test_image)
    assert calls == ["12ch", "3ch", ("tiled", True, 256, 16)]
    assert out is not None

    # and when the tiled rung also fails -> bicubic floor
    def tiled_fail(image, three_channel, tile_size, padding):
        calls.append("tiled-fail")
        raise RuntimeError("boom-tiled")

    calls.clear()
    monkeypatch.setattr(pipe, "_esrgan_tiled", tiled_fail)
    out = pipe._apply_esrgan(test_image)
    assert "tiled-fail" in calls
    assert out is not None  # bicubic floor


def test_cpu_backend_fallback_rung(tmp_path, tiny_ckpt, test_image,
                                   monkeypatch):
    """VERDICT round 3 #7: when every accelerator rung fails at the backend
    level, the ladder re-jits the forward on the host CPU backend
    (fallback_to_cpu, reference nesr.py:951-983) instead of dropping straight
    to bicubic."""
    pipe = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                        fallback_to_cpu=True)
    pipe._load_models()
    calls = []

    def device_boom(name):
        def _fail(*a, **k):
            calls.append(name)
            raise RuntimeError("INTERNAL: device program launch failed")
        return _fail

    monkeypatch.setattr(pipe, "_apply_esrgan_12channel", device_boom("12ch"))
    monkeypatch.setattr(pipe, "_apply_esrgan_3channel", device_boom("3ch"))
    monkeypatch.setattr(pipe, "_esrgan_tiled", device_boom("tiled"))
    img = test_image[:48, :48]
    out = pipe._apply_esrgan(img)
    assert calls == ["12ch", "3ch", "tiled"]
    assert out.shape == (192, 192, 3)  # x4: the model ran, not bicubic (x2)

    # Elongated images must take the same whole-vs-tiled routing rule as
    # _esrgan_whole: a 20x150 frame can't be reflect-padded to a 48-px tile
    # grid (pad > side), so the rescue runs the whole forward.
    pipe_thin = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                             fallback_to_cpu=True, max_tile_size=48)
    pipe_thin._load_models()
    monkeypatch.setattr(pipe_thin, "_apply_esrgan_12channel",
                        device_boom("12ch"))
    monkeypatch.setattr(pipe_thin, "_apply_esrgan_3channel",
                        device_boom("3ch"))
    monkeypatch.setattr(pipe_thin, "_esrgan_tiled", device_boom("tiled"))
    out_thin = pipe_thin._apply_esrgan(test_image[:20, :150])
    assert out_thin.shape == (80, 600, 3)  # x4, not the bicubic floor

    # and with the rung disabled, the same failures hit the bicubic floor
    pipe_off = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=False,
                            fallback_to_cpu=False)
    pipe_off._load_models()
    monkeypatch.setattr(pipe_off, "_apply_esrgan_12channel",
                        device_boom("12ch"))
    monkeypatch.setattr(pipe_off, "_apply_esrgan_3channel", device_boom("3ch"))
    monkeypatch.setattr(pipe_off, "_esrgan_tiled", device_boom("tiled"))
    out_off = pipe_off._apply_esrgan(img)
    assert out_off.shape == (96, 96, 3)  # bicubic floor at upscale_factor=2


def test_inline_weight_download_on_load(tmp_path, monkeypatch):
    """Missing weights trigger an inline registry download inside
    _load_models (reference nesr.py:199-213), with a mocked fetch."""
    import torch

    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    from neural_enhanced_super_resolution_tpu.utils import downloader

    monkeypatch.setenv("NESR_MODELS_DIR", str(tmp_path))

    import jax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, init_rrdbnet)

    def fake_download(url, dest_path, expected_size=None, expected_md5=None,
                      progress_callback=None):
        # write a loadable tiny checkpoint where the real fetch would land
        os.makedirs(os.path.dirname(dest_path), exist_ok=True)
        cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                            num_block=2, num_grow_ch=4)
        params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
        sd = {}
        for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                     "conv_hr", "conv_last"):
            sd[f"{name}.weight"] = torch.from_numpy(
                np.asarray(params[name]["w"]).transpose(3, 2, 0, 1).copy())
            sd[f"{name}.bias"] = torch.from_numpy(
                np.asarray(params[name]["b"]))
        for i in range(cfg.num_block):
            for rdb in ("rdb1", "rdb2", "rdb3"):
                for ci in range(1, 6):
                    pr = params["body"][rdb][f"conv{ci}"]
                    sd[f"body.{i}.{rdb}.conv{ci}.weight"] = torch.from_numpy(
                        np.asarray(pr["w"][i]).transpose(3, 2, 0, 1).copy())
                    sd[f"body.{i}.{rdb}.conv{ci}.bias"] = torch.from_numpy(
                        np.asarray(pr["b"][i]))
        torch.save({"params_ema": sd}, dest_path)
        return True

    monkeypatch.setattr(downloader, "download_file", fake_download)
    pipe = SuperResolutionPipeline(config={
        "esrgan_arch": dict(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                            num_block=2, num_grow_ch=4),
        "use_diffusion": False, "segment_enhancement": False})
    pipe._load_models()
    assert "esrgan" in pipe.models, "inline download did not load weights"
    assert os.path.exists(os.path.join(
        str(tmp_path), "weights", "RealESRGAN_x2plus.pth"))


def test_diffusion_step_tiers():
    """10/15/20 steps by device tier (reference nesr.py:999-1025)."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(config={"use_esrgan": False,
                                           "use_diffusion": False,
                                           "segment_enhancement": False})
    tiers = {"tpu": 20, "cuda": 20, "mps": 15, "cpu": 10}
    for dev, want in tiers.items():
        pipe.device = dev
        steps = pipe.config.get("num_inference_steps")
        if steps is None:
            steps = {"tpu": 20, "cuda": 20, "mps": 15}.get(dev, 10)
        assert steps == want


def test_diffusion_max_megapixels_skip():
    """Inputs above diffusion_max_megapixels skip the branch (the logged
    deterministic analog of the reference's OOM-skip, nesr.py:1028-1031);
    inputs at or below the cap run it. None disables the cap."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    calls = []

    class FakeDiffusion:
        timer = None

        def __call__(self, prompt, image, **kw):
            calls.append(image.shape[:2])
            h, w = image.shape[:2]
            return np.zeros((h * 4, w * 4, 3), np.uint8)

    pipe = SuperResolutionPipeline(config={
        "use_esrgan": False, "use_diffusion": True,
        "segment_enhancement": False,
        "diffusion_max_megapixels": 0.002})  # 2000 px
    pipe.models["diffusion"] = FakeDiffusion()
    small = np.zeros((40, 40, 3), np.uint8)   # 1600 px <= cap
    big = np.zeros((64, 64, 3), np.uint8)     # 4096 px  > cap
    assert pipe._apply_diffusion(small, "p") is not None
    assert pipe._apply_diffusion(big, "p") is None
    assert calls == [(40, 40)]
    pipe.config["diffusion_max_megapixels"] = None  # reference semantics
    assert pipe._apply_diffusion(big, "p") is not None
    assert calls == [(40, 40), (64, 64)]


def test_streamed_final_matches_standard_chain(tmp_path, tiny_ckpt,
                                               test_image):
    """The streamed final iteration (ESRGAN+sharpen fused per tile, output
    landed on host while chunks compute) must agree with the standard
    ensemble+postprocess chain: identical geometry, bit-exact interior
    (differences are confined to the border band, where per-tile sharpen
    sees esrgan(reflect(x)) instead of reflect(esrgan(x)))."""
    img = test_image[:96, :96]
    kw = dict(adaptive_sharpening=True, data_parallel="off",
              max_tile_size=48, tile_halo=8)
    pipe_s = _mk_pipeline(tmp_path, tiny_ckpt, streamed_output=True, **kw)
    out_s = pipe_s.enhance_array(img)
    assert isinstance(out_s, np.ndarray)
    out_n = _mk_pipeline(tmp_path, tiny_ckpt, streamed_output=False,
                         **kw).enhance_array(img)
    assert out_s.shape == out_n.shape == (384, 384, 3)
    m = 8 * 4  # halo * scale border band
    np.testing.assert_array_equal(out_s[m:-m, m:-m], out_n[m:-m, m:-m])
    assert float(psnr(out_s, out_n)) > 35.0


def test_streamed_final_engages_when_diffusion_size_capped(tmp_path,
                                                           tiny_ckpt,
                                                           test_image):
    """use_diffusion=True with the input over diffusion_max_megapixels: the
    branch is a logged skip, ESRGAN is the sole upscaler, and the streamed
    tail must engage (round-5: on the TPU overlay's 0.27 MP cap every
    iteration after the first is capped out, so the full pipeline's final
    iteration is eligible — previously the bare use_diffusion veto forced
    the unstreamed finalize/d2h path, 12.7 s of serialized D2H in the
    config-5 artifact)."""
    img = test_image[:96, :96]
    kw = dict(adaptive_sharpening=True, data_parallel="off",
              max_tile_size=48, tile_halo=8, use_diffusion=True,
              diffusion_max_megapixels=0.005)  # 96x96 = 0.0092 MP > cap
    pipe_s = _mk_pipeline(tmp_path, tiny_ckpt, streamed_output=True, **kw)
    pipe_s.models["diffusion"] = object()  # never touched: cap precedes use
    out_s = pipe_s.enhance_array(img)
    assert "esrgan+post/streamed" in pipe_s.timer.report()
    pipe_n = _mk_pipeline(tmp_path, tiny_ckpt, streamed_output=False, **kw)
    pipe_n.models["diffusion"] = object()
    out_n = pipe_n.enhance_array(img)
    assert out_s.shape == out_n.shape == (384, 384, 3)
    m = 8 * 4  # halo * scale border band
    np.testing.assert_array_equal(out_s[m:-m, m:-m], out_n[m:-m, m:-m])
    # and when the input is UNDER the cap the veto must hold (diffusion
    # would run): streamed tail stays off
    pipe_v = _mk_pipeline(tmp_path, tiny_ckpt, streamed_output=True,
                          adaptive_sharpening=True, data_parallel="off",
                          max_tile_size=48, tile_halo=8, use_diffusion=True,
                          diffusion_max_megapixels=1.0)
    pipe_v.models["diffusion"] = object()
    assert not pipe_v._stream_final_ok(0, 1, img)


def test_streamed_final_respects_cancel(tmp_path, tiny_ckpt, test_image):
    from neural_enhanced_super_resolution_tpu.pipeline import (
        EnhancementCancelled)

    calls = {"n": 0}

    def cancel_soon():
        calls["n"] += 1
        return calls["n"] > 2

    pipe = _mk_pipeline(tmp_path, tiny_ckpt, adaptive_sharpening=True,
                        data_parallel="off", max_tile_size=24, tile_halo=4,
                        tile_batch=2, cancel_check=cancel_soon)
    with pytest.raises(EnhancementCancelled):
        pipe.enhance_array(test_image[:96, :96])
