"""Utility layer: degradation/comparison (reference API), IO, downloader,
metrics. Export surface mirrors /root/reference/nesr/utils/__init__.py:6-13."""

from neural_enhanced_super_resolution_tpu.utils.image_utils import (
    add_noise, blur_image, downsample_image, apply_jpeg_compression,
    create_comparison_image, add_text_to_image)
from neural_enhanced_super_resolution_tpu.utils.io import (imread_rgb,
                                                           imwrite_rgb)
from neural_enhanced_super_resolution_tpu.utils.metrics import psnr, ssim

__all__ = [
    "add_noise", "blur_image", "downsample_image", "apply_jpeg_compression",
    "create_comparison_image", "add_text_to_image",
    "imread_rgb", "imwrite_rgb", "psnr", "ssim",
]
