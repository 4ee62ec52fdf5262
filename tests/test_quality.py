"""Quality integration tests with a real *trained* tiny checkpoint.

tests/fixtures/tiny_trained_x4.safetensors is produced by
tools/train_tiny_esrgan.py (L1 training on patches of the fixture image).
Unlike random weights, this model must genuinely beat bicubic upsampling —
turning the reference's manual degrade->enhance->compare workflow
(SURVEY.md §4) into an automated quality gate with PSNR/SSIM numbers
(which the reference never computes).
"""

import os

import numpy as np
import pytest

from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
from neural_enhanced_super_resolution_tpu.ops.resize import resize
from neural_enhanced_super_resolution_tpu.utils import psnr, ssim

CKPT = os.path.join(os.path.dirname(__file__), "fixtures",
                    "tiny_trained_x4.safetensors")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="trained fixture checkpoint missing")

TRAINED_ARCH = dict(num_in_ch=12, num_out_ch=3, scale=4, num_feat=16,
                    num_block=2, num_grow_ch=8)


def test_trained_model_beats_bicubic(tmp_path, test_image):
    hr = test_image  # 160x160 fixture
    lr = np.asarray(resize(hr, dsize=(hr.shape[1] // 4, hr.shape[0] // 4),
                           interpolation="bicubic"))

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False, "segment_enhancement": False,
        "denoise_level": 0, "adaptive_sharpening": False,
        "esrgan_model_path": CKPT, "esrgan_arch": dict(TRAINED_ARCH),
        "output_dir": str(tmp_path / "out")})
    enhanced = pipe.enhance_array(lr)
    assert enhanced.shape == hr.shape

    bicubic = np.asarray(resize(lr, dsize=(hr.shape[1], hr.shape[0]),
                                interpolation="bicubic"))
    p_model = float(psnr(hr, enhanced))
    p_bicubic = float(psnr(hr, bicubic))
    s_model = float(ssim(hr, enhanced))
    s_bicubic = float(ssim(hr, bicubic))
    # The trained model must reconstruct better than plain interpolation.
    assert p_model > p_bicubic, (p_model, p_bicubic)
    assert s_model > s_bicubic, (s_model, s_bicubic)


@pytest.mark.parametrize("tile_halo", [6, 10, 16])
def test_trained_model_tiled_quality_close_to_whole(tmp_path, test_image,
                                                    tile_halo):
    """Halo tiling must not measurably change the output (the reference can
    only eyeball this; we gate on PSNR between the two paths on the model's
    trained x4 task). Parametrised over the halo range [6, 16] with TRAINED
    weights — evidence behind the tile_halo=10 TPU production default
    (ADVICE round 2 / RESULTS.md round-2 sweep used random weights)."""
    lr = np.asarray(resize(test_image,
                           dsize=(test_image.shape[1] // 2,
                                  test_image.shape[0] // 2),
                           interpolation="bicubic"))
    common = {"iterations": 1, "use_diffusion": False,
              "segment_enhancement": False, "denoise_level": 0,
              "adaptive_sharpening": False, "esrgan_model_path": CKPT,
              "esrgan_arch": dict(TRAINED_ARCH),
              "output_dir": str(tmp_path / "out")}
    whole = SuperResolutionPipeline(device="cpu",
                                    config=dict(common)).enhance_array(lr)
    tiled = SuperResolutionPipeline(device="cpu", config=dict(
        common, enable_tiling=True, max_megapixels=0.0001,
        max_tile_size=48, tile_halo=tile_halo)).enhance_array(lr)
    # Tiled output lands on the reference's 2x canvas geometry; compare the
    # two paths on the same grid. Divergence comes only from tile halos and
    # the canvas resample, and must stay bounded.
    whole2 = np.asarray(resize(whole, dsize=(tiled.shape[1], tiled.shape[0]),
                               interpolation="lanczos4"))
    assert float(psnr(tiled, whole2)) > 25.0


def test_int8_trunk_quality(tmp_path, test_image):
    """esrgan_trunk: "int8" (opt-in fast mode) must stay visually
    equivalent on the trained model: the int8-trunk output vs the exact
    bf16-trunk output >= 40 dB PSNR, and the enhancement quality vs the
    clean original within 0.15 dB of the exact trunk (the BASELINE.md
    parity budget class)."""
    lr = np.asarray(resize(test_image,
                           dsize=(test_image.shape[1] // 2,
                                  test_image.shape[0] // 2),
                           interpolation="bicubic"))
    common = {"iterations": 1, "use_diffusion": False,
              "segment_enhancement": False, "denoise_level": 0,
              "adaptive_sharpening": False, "esrgan_model_path": CKPT,
              "esrgan_arch": dict(TRAINED_ARCH),
              "output_dir": str(tmp_path / "out")}
    exact = SuperResolutionPipeline(device="cpu",
                                    config=dict(common)).enhance_array(lr)
    q = SuperResolutionPipeline(device="cpu", config=dict(
        common, esrgan_trunk="int8")).enhance_array(lr)
    assert q.shape == exact.shape
    p_cross = float(psnr(q, exact))
    assert p_cross > 40.0, p_cross

    ref = np.asarray(resize(test_image, dsize=(q.shape[1], q.shape[0]),
                            interpolation="lanczos4"))
    d = abs(float(psnr(q, ref)) - float(psnr(exact, ref)))
    assert d < 0.15, d


def test_denoise_cap_quality(test_image):
    """denoise_max_megapixels (the NL-means resolution cap,
    ops/enhance.denoise_stage): on a model-upscaled frame carrying upscaled
    noise — the pipeline's late-iteration regime — the capped
    residual-transfer denoise must stay within 1 dB of full-resolution
    NL-means against the clean frame, and beat not denoising at all."""
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.ops.enhance import denoise_stage
    from neural_enhanced_super_resolution_tpu.utils import add_noise

    # late-iteration analog: noise added at low res, then upscaled x2 with
    # the image (band-limited noise below the new Nyquist)
    clean_lr = test_image  # 160x160
    noisy_lr = add_noise(clean_lr, noise_type="gaussian", amount=0.06)
    up = lambda im: np.asarray(resize(im, dsize=(320, 320),
                                      interpolation="bicubic"))
    clean, noisy = up(clean_lr), up(np.asarray(noisy_lr))

    full = np.asarray(denoise_stage(jnp.asarray(noisy), 0.5))
    capped = np.asarray(denoise_stage(jnp.asarray(noisy), 0.5,
                                      max_megapixels=0.04))  # forces factor 2
    p_noisy = float(psnr(clean, noisy))
    p_full = float(psnr(clean, full))
    p_capped = float(psnr(clean, capped))
    print(f"\ndenoise cap: noisy {p_noisy:.2f} dB, full {p_full:.2f} dB, "
          f"capped {p_capped:.2f} dB")
    assert p_full > p_noisy          # denoising helps at all
    assert p_capped > p_noisy        # capped denoising still helps
    assert p_capped > p_full - 1.0   # within 1 dB of full-res NL-means
