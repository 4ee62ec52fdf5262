"""Composite enhancement ops: preprocess, unsharp, adaptive sharpen, ensemble.

Each function reproduces one reference pipeline stage as a single jittable XLA
computation (the reference chains separate OpenCV calls with host round-trips;
here XLA fuses the chain and the image stays on device):

- preprocess:        /root/reference/nesr/nesr.py:668-689  (NlMeans + CLAHE-on-L)
- unsharp_mask:      nesr.py:739-740, :1068-1069           (1.5*img - 0.5*blur(sigma=3))
- masked_sharpen:    nesr.py:731-747   (segmentation-guided sharpening blend)
- adaptive_sharpen:  nesr.py:1056-1084 (detail-masked unsharp postprocess)
- ensemble:          nesr.py:1033-1054 (align to max size + uniform average)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.ops.blur import (dilate as _dilate,
                                                            gaussian_blur as _gaussian_blur)
from neural_enhanced_super_resolution_tpu.ops.clahe import clahe as _clahe_apply
from neural_enhanced_super_resolution_tpu.ops.color import (lab_to_rgb as _lab_to_rgb,
                                                            rgb_to_gray as _rgb_to_gray,
                                                            rgb_to_lab as _rgb_to_lab)
from neural_enhanced_super_resolution_tpu.ops.nlmeans import (
    nl_means_colored as _nl_means_colored)
from neural_enhanced_super_resolution_tpu.ops.pointwise import (
    add_weighted as _add_weighted, convert_scale_abs as _convert_scale_abs,
    subtract as _subtract, threshold_binary as _threshold_binary)
from neural_enhanced_super_resolution_tpu.ops.resize import resize as _resize_fn

__all__ = ["preprocess", "denoise_stage", "contrast_stage", "unsharp_mask",
           "masked_sharpen", "adaptive_sharpen", "ensemble"]

# ---------------------------------------------------------------------------
# Fixed-shape tiled routing for LOCAL stages.
#
# enhance_image's per-iteration image sizes grow geometrically
# (/root/reference/nesr/nesr.py:516-633), so whole-image jits never see the
# same shape twice and every iteration pays a fresh (slow, remote) compile —
# the dominant cost of a cold full-pipeline run. Every op here except CLAHE
# is LOCAL with a bounded radius (NL-means search 21 + patch 7 -> 13 px;
# sigma<=3 Gaussians -> 9 px), so large images route through the SAME
# fixed-tile machinery as ESRGAN (parallel/tiling.process_tiled, scale=1,
# halo 16 >= radius, reflect-padded): one compiled program covers every
# image size and iteration. Interior results are bit-identical; image-border
# results match because both paths see the same reflect extension.
# CLAHE is global (8x8 tile grid over the full image) and stays whole-image.
# ---------------------------------------------------------------------------

_TILED_THRESHOLD = 768  # route through fixed tiles above this edge length
_OP_TILE = 512
_OP_HALO = 16


@functools.cache
def _default_tail() -> str:
    """One-program ("full") tail policy pays off where per-executable
    first-execution costs are seconds (remote/tunnel accelerator hosts,
    RESULTS.md round-4 warm-serving study); on CPU extra jit
    specializations are cheap and padding the tail to a full batch is pure
    wasted compute, so bucket there — mirroring config tile_tail's
    base-vs-tpu-overlay split (runtime/config.py)."""
    import jax as _jax
    return "full" if _jax.default_backend() != "cpu" else "bucket"


def _tiled_unit_op(fn, img, *extra_channels, batch_tiles=32, tail=None):
    """Run a local (H, W, C)->(H, W, C) op via the fixed-tile path.

    extra_channels: additional (H, W) planes (e.g. a segmentation mask)
    stacked onto the tile so the op sees matching tile crops.
    batch_tiles/tail bound the jit-specialization count: with tail="full"
    every large image runs the SAME (32, 544, 544, ·) program regardless of
    size or iteration — on remote/tunnel TPU hosts each extra executable
    costs first-execution seconds per process (RESULTS.md round-4
    warm-serving study). Expensive-per-tile ops (NL-means) pass
    tail="bucket" so small images don't pay 31 padded tiles of real work;
    tail=None resolves per backend (_default_tail).
    """
    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        process_tiled)

    if tail is None:
        tail = _default_tail()

    img = jnp.asarray(img)
    if max(int(img.shape[0]), int(img.shape[1])) <= _TILED_THRESHOLD:
        return fn(img, *extra_channels) if not extra_channels else \
            fn(img, extra_channels[0])
    c = img.shape[-1]
    packed = img
    if extra_channels:
        packed = jnp.concatenate(
            [img] + [e[:, :, None].astype(img.dtype)
                     for e in extra_channels], axis=-1)

    def tile_fn(tiles):  # (B, T, T, C+extra) -> (B, T, T, C)
        def one(t):
            if extra_channels:
                return fn(t[..., :c], t[..., c])
            return fn(t)
        return jax.vmap(one)(tiles)

    return process_tiled(tile_fn, packed, tile_size=_OP_TILE, halo=_OP_HALO,
                         scale=1, batch_tiles=batch_tiles,
                         tail=tail)[..., :c]


@jax.jit
def _clahe_contrast(img) -> jax.Array:
    """RGB -> LAB -> CLAHE(2.0, 8x8) on L -> RGB, as ONE fused XLA program
    (the reference round-trips four separate cv2 calls, nesr.py:679-685)."""
    lab = _rgb_to_lab(img)
    l_eq = _clahe_apply(lab[:, :, 0], clip_limit=2.0, tile_grid_size=(8, 8))
    lab = jnp.concatenate([l_eq[:, :, None], lab[:, :, 1:]], axis=-1)
    return _lab_to_rgb(lab)


def denoise_stage(img, denoise_level: float = 0.5,
                  max_megapixels: float | None = None) -> jax.Array:
    """NL-means denoise (h = level*10), the first half of _preprocess_image
    (/root/reference/nesr/nesr.py:671-676).

    max_megapixels (None = off) caps the resolution NL-means runs at — the
    denoise analog of the reference's <=1024 px segmentation-inference cap
    (nesr.py:704-709). Above the cap, the noise residual is estimated at the
    capped scale and transferred: out = img - up(small - nlmeans(small)).
    This is principled for the pipeline's late iterations, whose frames are
    model-upscaled so any surviving noise is band-limited below the new
    Nyquist — exactly the band a downscaled residual preserves. Quality gate:
    tests/test_quality.py::test_denoise_cap_quality.
    """
    img = jnp.asarray(img)
    strength = float(denoise_level) * 10.0
    fn = functools.partial(_nl_means_colored, h=strength, h_color=strength,
                           template=7, search=21)
    h, w = int(img.shape[0]), int(img.shape[1])
    mp = h * w / 1e6
    if max_megapixels is None or mp <= float(max_megapixels):
        return _tiled_unit_op(fn, img, tail="bucket")
    # integer shrink factor keeps the resample kernels clean (area-average
    # down, bilinear residual up)
    factor = 2
    while mp / (factor * factor) > float(max_megapixels) and factor < 8:
        factor *= 2
    sh, sw = h // factor, w // factor
    small = _resize_fn(img, dsize=(sw, sh), interpolation="area")
    den_small = _tiled_unit_op(fn, small, tail="bucket")
    return _denoise_residual_apply(img, small, den_small)


@jax.jit
def _denoise_residual_apply(img, small, den_small) -> jax.Array:
    resid = small.astype(jnp.float32) - den_small.astype(jnp.float32)
    h, w = img.shape[0], img.shape[1]
    resid_up = _resize_fn(resid, dsize=(w, h), interpolation="bilinear")
    out = img.astype(jnp.float32) - resid_up
    return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)


def contrast_stage(img) -> jax.Array:
    """CLAHE(2.0, 8x8) on the LAB L channel, the second half of
    _preprocess_image (nesr.py:679-687)."""
    return _clahe_contrast(img)


def preprocess(img, denoise_level: float = 0.5) -> jax.Array:
    """Denoise (NL-means, h = level*10) then CLAHE(2.0, 8x8) on the LAB L channel.

    Mirrors _preprocess_image (/root/reference/nesr/nesr.py:668-689): denoising
    only runs when denoise_level > 0; CLAHE always runs.
    """
    img = jnp.asarray(img)
    if denoise_level > 0:
        img = denoise_stage(img, denoise_level)
    return _clahe_contrast(img)


@jax.jit
def unsharp_mask(img) -> jax.Array:
    """sharpened = addWeighted(img, 1.5, GaussianBlur(img, 0, 3), -0.5, 0)."""
    blurred = _gaussian_blur(img, (0, 0), 3.0)
    return _add_weighted(img, 1.5, blurred, -0.5, 0.0)


@jax.jit
def _masked_sharpen_impl(img, mask) -> jax.Array:
    mask = _dilate(mask, 3, 1)
    sharpened = unsharp_mask(img)
    return jnp.where(mask[:, :, None] == 1, sharpened, img)


def masked_sharpen(img, mask) -> jax.Array:
    """Segmentation-guided sharpening (nesr.py:731-747).

    ``mask`` is a uint8 (H, W) object mask; it is dilated 3x3 once and the
    unsharp-masked image replaces the original where mask == 1. Large images
    run tiled (fixed-shape compile; see module comment)."""
    return _tiled_unit_op(_masked_sharpen_impl, jnp.asarray(img),
                          jnp.asarray(mask))


@jax.jit
def _adaptive_sharpen_impl(img) -> jax.Array:
    gray = _rgb_to_gray(img)
    low = _gaussian_blur(gray, (0, 0), 2.0)
    variance = _subtract(gray, low)           # saturating: negatives clamp to 0
    variance = _convert_scale_abs(variance)
    alpha = _threshold_binary(variance, 10.0, 255.0)
    sharpened = unsharp_mask(img)
    return jnp.where(alpha[:, :, None] > 0, sharpened, img)


def adaptive_sharpen(img) -> jax.Array:
    """Detail-adaptive unsharp mask (_postprocess_image, nesr.py:1056-1084).

    detail = |gray - blur(gray, sigma=2)| thresholded at 10 -> binary alpha;
    output = img*(1-alpha) + unsharp(img)*alpha. Since alpha is binary, the
    blend is an exact select. Large images run tiled (fixed-shape compile;
    see module comment)."""
    return _tiled_unit_op(_adaptive_sharpen_impl, jnp.asarray(img))


def ensemble(images) -> jax.Array:
    """Uniform-weight ensemble of model outputs (_ensemble_results, :1033-1054).

    Aligns all images to the lexicographic max (h, w) — the reference's exact
    (quirky) rule, not per-axis max — via Lanczos resize, then averages in f32
    and truncates to uint8 (NumPy-cast semantics, not rounding).
    """
    if len(images) == 1:
        return jnp.asarray(images[0])
    shapes = [(int(im.shape[0]), int(im.shape[1])) for im in images]
    target_h, target_w = max(shapes)
    aligned = []
    for im in images:
        im = jnp.asarray(im)
        if im.shape[0] != target_h or im.shape[1] != target_w:
            im = _resize_fn(im, dsize=(target_w, target_h),
                                interpolation="lanczos4")
        aligned.append(im)
    return _ensemble_mean(tuple(aligned))


@functools.partial(jax.jit, static_argnames=())
def _ensemble_mean(aligned: tuple) -> jax.Array:
    w = 1.0 / len(aligned)
    acc = jnp.zeros(aligned[0].shape, jnp.float32)
    for im in aligned:
        acc = acc + im.astype(jnp.float32) * w
    return acc.astype(jnp.uint8)  # truncating cast, as the reference does
