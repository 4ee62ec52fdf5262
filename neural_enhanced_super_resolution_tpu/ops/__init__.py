"""XLA/Pallas image-op library (layer L2' of the TPU-native build).

OpenCV-parity classical ops, reimplemented as jittable, fusable XLA programs:
resize family, colorspace conversion, separable filtering, CLAHE, NL-means
denoising, and the composite enhancement stages. See SURVEY.md §2b ("OpenCV
image ops") for the component mapping.
"""

from neural_enhanced_super_resolution_tpu.ops.resize import (
    resize, INTER_NEAREST, INTER_LINEAR, INTER_CUBIC, INTER_AREA,
    INTER_LANCZOS4)
from neural_enhanced_super_resolution_tpu.ops.color import (
    rgb_to_bgr, bgr_to_rgb, rgb_to_gray, rgb_to_lab, lab_to_rgb)
from neural_enhanced_super_resolution_tpu.ops.blur import (
    gaussian_blur, box_blur, filter2d, dilate, gaussian_kernel1d)
from neural_enhanced_super_resolution_tpu.ops.pointwise import (
    add_weighted, subtract, convert_scale_abs, threshold_binary)
from neural_enhanced_super_resolution_tpu.ops.clahe import clahe
from neural_enhanced_super_resolution_tpu.ops.nlmeans import (
    nl_means, nl_means_colored)
from neural_enhanced_super_resolution_tpu.ops.enhance import (
    preprocess, unsharp_mask, masked_sharpen, adaptive_sharpen, ensemble)

__all__ = [
    "resize", "INTER_NEAREST", "INTER_LINEAR", "INTER_CUBIC", "INTER_AREA",
    "INTER_LANCZOS4",
    "rgb_to_bgr", "bgr_to_rgb", "rgb_to_gray", "rgb_to_lab", "lab_to_rgb",
    "gaussian_blur", "box_blur", "filter2d", "dilate", "gaussian_kernel1d",
    "add_weighted", "subtract", "convert_scale_abs", "threshold_binary",
    "clahe", "nl_means", "nl_means_colored",
    "preprocess", "unsharp_mask", "masked_sharpen", "adaptive_sharpen",
    "ensemble",
]
