"""Degradation & comparison utilities (reference API parity).

Same function names/signatures as /root/reference/nesr/utils/image_utils.py
(exported from its utils/__init__.py:6-13): add_noise, blur_image,
downsample_image, apply_jpeg_compression, create_comparison_image,
add_text_to_image. The degradation family doubles as the fault-injection
harness (SURVEY.md §5): degrade -> enhance -> compare round trips are the
de-facto integration tests.

Noise generation runs through XLA where it pays off; JPEG re-encode and text
overlay are host-side (PIL) by design.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image, ImageDraw

from neural_enhanced_super_resolution_tpu.ops.blur import (box_blur, filter2d,
                                                           gaussian_blur)
from neural_enhanced_super_resolution_tpu.ops.resize import resize

__all__ = ["add_noise", "blur_image", "downsample_image",
           "apply_jpeg_compression", "create_comparison_image",
           "add_text_to_image"]


def add_noise(image: np.ndarray, noise_type: str = "gaussian",
              amount: float = 0.1, rng: np.random.Generator | None = None
              ) -> np.ndarray:
    """Synthetic noise: gaussian / salt & pepper / speckle / poisson
    (reference image_utils.py:11-63 semantics)."""
    if amount <= 0:
        return image.copy()
    rng = rng or np.random.default_rng()
    result = image.astype(np.float32).copy()

    if noise_type == "gaussian":
        result += rng.normal(0.0, amount * 255.0, image.shape)
    elif noise_type in ("salt & pepper", "salt_pepper"):
        s_vs_p = 0.5
        salt = int(np.ceil(amount * image.size * s_vs_p))
        pepper = int(np.ceil(amount * image.size * (1.0 - s_vs_p)))
        ys = rng.integers(0, image.shape[0] - 1, salt)
        xs = rng.integers(0, image.shape[1] - 1, salt)
        result[ys, xs, :] = 255
        ys = rng.integers(0, image.shape[0] - 1, pepper)
        xs = rng.integers(0, image.shape[1] - 1, pepper)
        result[ys, xs, :] = 0
    elif noise_type == "speckle":
        noise = rng.normal(0.0, amount, image.shape).astype(np.float32)
        result += result * noise
    elif noise_type == "poisson":
        scaling = amount * 10.0
        result = (rng.poisson(image / 255.0 * scaling) / scaling * 255.0
                  ).astype(np.float32)
    return np.clip(result, 0, 255).astype(np.uint8)


def blur_image(image: np.ndarray, blur_type: str = "gaussian",
               radius: int = 3) -> np.ndarray:
    """gaussian / box / motion blur (reference image_utils.py:65-97)."""
    if radius <= 0:
        return image.copy()
    k = radius * 2 + 1
    if blur_type == "box":
        return np.asarray(box_blur(image, (k, k)))
    if blur_type == "motion":
        kernel = np.zeros((k, k), np.float32)
        kernel[(k - 1) // 2, :] = 1.0
        kernel /= k
        return np.asarray(filter2d(image, kernel))
    return np.asarray(gaussian_blur(image, (k, k), 0.0))


def downsample_image(image: np.ndarray, scale_factor: float = 0.5,
                     interpolation: str = "bicubic") -> np.ndarray:
    """Downsample with nearest/bilinear/bicubic/lanczos
    (reference image_utils.py:99-128)."""
    if scale_factor >= 1.0:
        return image.copy()
    h, w = image.shape[:2]
    new_w, new_h = int(w * scale_factor), int(h * scale_factor)
    mode = {"nearest": "nearest", "bilinear": "bilinear",
            "bicubic": "bicubic", "lanczos": "lanczos4"}.get(
                interpolation.lower(), "bicubic")
    return np.asarray(resize(image, dsize=(new_w, new_h), interpolation=mode))


def apply_jpeg_compression(image: np.ndarray, quality: int = 75) -> np.ndarray:
    """Round-trip through an in-memory JPEG encode
    (reference image_utils.py:130-152)."""
    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.array(Image.open(buf))


def create_comparison_image(original: np.ndarray, enhanced: np.ndarray,
                            orientation: str = "horizontal") -> np.ndarray:
    """Side-by-side/vertical comparison with a red divider
    (reference image_utils.py:154-200)."""
    if orientation.lower() == "horizontal":
        oh, ow = original.shape[:2]
        eh, ew = enhanced.shape[:2]
        if oh != eh:
            scale = oh / eh
            enhanced = np.asarray(resize(enhanced,
                                         dsize=(int(ew * scale), oh),
                                         interpolation="lanczos4"))
        comparison = np.hstack((original, enhanced))
        comparison[:, ow:ow + 1, :] = [255, 0, 0]
    else:
        oh, ow = original.shape[:2]
        eh, ew = enhanced.shape[:2]
        if ow != ew:
            scale = ow / ew
            enhanced = np.asarray(resize(enhanced,
                                         dsize=(ow, int(eh * scale)),
                                         interpolation="lanczos4"))
        comparison = np.vstack((original, enhanced))
        comparison[oh:oh + 1, :, :] = [255, 0, 0]
    return comparison


def add_text_to_image(image: np.ndarray, text: str, position="top",
                      font_scale: float = 1.0,
                      color=(255, 255, 255)) -> np.ndarray:
    """Text overlay with dark backing box (reference image_utils.py:202-253;
    PIL-rendered rather than Hershey fonts)."""
    result = Image.fromarray(image.copy())
    draw = ImageDraw.Draw(result)
    bbox = draw.textbbox((0, 0), text)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    if position == "top":
        x, y = int((image.shape[1] - tw) / 2), th + 10
    elif position == "bottom":
        x, y = int((image.shape[1] - tw) / 2), image.shape[0] - 10 - th
    else:
        x, y = position
    draw.rectangle((x - 5, y - 5, x + tw + 5, y + th + 5), fill=(0, 0, 0))
    draw.text((x, y), text, fill=tuple(color))
    return np.asarray(result)
