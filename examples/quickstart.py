#!/usr/bin/env python3
"""Quickstart: degrade -> enhance -> compare with quality metrics.

Runs entirely self-contained on the bundled trained tiny checkpoint (no
downloads needed); swap `esrgan_model_path`/`esrgan_arch` for the published
RealESRGAN_x2plus weights in a connected environment.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from nesr import SuperResolutionPipeline  # drop-in reference import path
from neural_enhanced_super_resolution_tpu.ops.resize import resize
from neural_enhanced_super_resolution_tpu.utils import (
    create_comparison_image, imread_rgb, imwrite_rgb, psnr, ssim)

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "..", "tests", "fixtures",
                    "tiny_trained_x4.safetensors")


def main() -> int:
    hr = imread_rgb(os.path.join(HERE, "..", "tests", "fixtures",
                                 "test.jpeg"))
    # degrade: x4 bicubic downsample (utils.image_utils has noise/blur/JPEG
    # degradations too)
    lr = np.asarray(resize(hr, dsize=(hr.shape[1] // 4, hr.shape[0] // 4),
                           interpolation="bicubic"))

    pipe = SuperResolutionPipeline(config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "denoise_level": 0,
        "adaptive_sharpening": False,
        "esrgan_model_path": CKPT,
        "esrgan_arch": dict(num_in_ch=12, num_out_ch=3, scale=4,
                            num_feat=16, num_block=2, num_grow_ch=8),
        "output_dir": "outputs"})
    enhanced = pipe.enhance_array(lr)

    bicubic = np.asarray(resize(lr, dsize=(hr.shape[1], hr.shape[0]),
                                interpolation="bicubic"))
    print(f"bicubic : PSNR {float(psnr(hr, bicubic)):5.2f} dB  "
          f"SSIM {float(ssim(hr, bicubic)):.4f}")
    print(f"enhanced: PSNR {float(psnr(hr, enhanced)):5.2f} dB  "
          f"SSIM {float(ssim(hr, enhanced)):.4f}")

    comparison = create_comparison_image(bicubic, enhanced, "horizontal")
    out = imwrite_rgb("outputs/quickstart_comparison.png", comparison)
    print(f"side-by-side saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
