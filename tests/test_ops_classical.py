"""Golden-parity tests: XLA image ops vs. OpenCV (SURVEY.md §4 test pyramid).

Each op is compared against the exact cv2 call the reference makes. uint8
tolerances reflect cv2's fixed-point internals: <=1 for exact-algorithm ops,
<=2 for gaussian (16-bit fixed-point kernels), statistical for NL-means (LUT
approximated exp in cv2).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from neural_enhanced_super_resolution_tpu import ops


def _maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int)).max())


# ---------------------------------------------------------------- resize ----

RESIZE_MODES = [("nearest", cv2.INTER_NEAREST), ("bilinear", cv2.INTER_LINEAR),
                ("bicubic", cv2.INTER_CUBIC), ("lanczos4", cv2.INTER_LANCZOS4),
                ("area", cv2.INTER_AREA)]
RESIZE_SIZES = [(50, 40), (200, 260), (97, 123), (64, 64)]


@pytest.mark.parametrize("mode,cv_mode", RESIZE_MODES)
@pytest.mark.parametrize("dsize", RESIZE_SIZES)
def test_resize_matches_cv2(rng, mode, cv_mode, dsize):
    img = rng.integers(0, 256, (97, 123, 3), dtype=np.uint8)
    ours = ops.resize(img, dsize=dsize, interpolation=mode)
    ref = cv2.resize(img, dsize, interpolation=cv_mode)
    assert _maxdiff(ours, ref) <= 1


def test_resize_grayscale_and_fx_fy(rng):
    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    ours = ops.resize(img, fx=2.0, fy=2.0, interpolation="bicubic")
    ref = cv2.resize(img, None, fx=2.0, fy=2.0, interpolation=cv2.INTER_CUBIC)
    assert ours.shape == ref.shape
    assert _maxdiff(ours, ref) <= 1


def test_resize_float_input(rng):
    img = rng.random((30, 40, 3), dtype=np.float32)
    ours = np.asarray(ops.resize(img, dsize=(80, 60), interpolation="bilinear"))
    ref = cv2.resize(img, (80, 60), interpolation=cv2.INTER_LINEAR)
    assert np.allclose(ours, ref, atol=1e-5)


# ----------------------------------------------------------------- color ----

def test_rgb_gray_lab_roundtrip(rng, test_image):
    img = test_image
    assert _maxdiff(ops.rgb_to_gray(img), cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)) <= 1
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    # cv2's 8U Lab uses fixed-point LUT interpolation; a handful of pixels
    # land 3 counts away from the float-exact value.
    dl = np.abs(np.asarray(ops.rgb_to_lab(img)).astype(int) - lab.astype(int))
    assert dl.max() <= 3 and dl.mean() < 0.5 and (dl > 2).mean() < 1e-3
    assert _maxdiff(ops.lab_to_rgb(lab), cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)) <= 2
    assert np.array_equal(np.asarray(ops.rgb_to_bgr(img)), img[..., ::-1])


def test_linear_lab_matches_cv2_lbgr(rng):
    img = rng.integers(0, 256, (31, 47, 3), dtype=np.uint8)
    ours = ops.rgb_to_lab(img[..., ::-1], srgb=False)
    ref = cv2.cvtColor(img, cv2.COLOR_LBGR2Lab)
    assert _maxdiff(ours, ref) <= 2


# ------------------------------------------------------------------ blur ----

@pytest.mark.parametrize("ksize,sigma", [((3, 3), 0), ((0, 0), 3.0),
                                         ((0, 0), 2.0), ((7, 7), 0),
                                         ((5, 5), 1.1)])
def test_gaussian_blur_matches_cv2(rng, ksize, sigma):
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    ours = ops.gaussian_blur(img, ksize, sigma)
    ref = cv2.GaussianBlur(img, ksize, sigma)
    assert _maxdiff(ours, ref) <= 2


def test_box_and_motion_blur(rng):
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    assert _maxdiff(ops.box_blur(img, (7, 7)), cv2.boxFilter(img, -1, (7, 7))) <= 1
    k = np.zeros((7, 7)); k[3, :] = 1.0 / 7.0
    assert _maxdiff(ops.filter2d(img, k), cv2.filter2D(img, -1, k)) <= 1


def test_dilate_matches_cv2(rng):
    mask = (rng.random((40, 50)) > 0.7).astype(np.uint8)
    ours = ops.dilate(mask, 3, 1)
    ref = cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=1)
    assert np.array_equal(np.asarray(ours), ref)


# ------------------------------------------------------------- pointwise ----

def test_pointwise_saturation(rng):
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert _maxdiff(ops.add_weighted(a, 1.5, b, -0.5),
                    cv2.addWeighted(a, 1.5, b, -0.5, 0)) <= 1
    assert _maxdiff(ops.subtract(a, b), cv2.subtract(a, b)) == 0
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    _, ref = cv2.threshold(g, 10, 255, cv2.THRESH_BINARY)
    assert np.array_equal(np.asarray(ops.threshold_binary(g, 10)), ref)


# ----------------------------------------------------------------- clahe ----

@pytest.mark.parametrize("shape", [(64, 64), (97, 123), (512, 400)])
def test_clahe_matches_cv2(rng, shape):
    gray = rng.integers(0, 256, shape, dtype=np.uint8)
    ours = ops.clahe(gray, 2.0, (8, 8))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(gray)
    assert _maxdiff(ours, ref) <= 1


def test_clahe_natural_image(test_image):
    gray = cv2.cvtColor(test_image, cv2.COLOR_RGB2GRAY)
    ours = ops.clahe(gray, 2.0, (8, 8))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(gray)
    assert _maxdiff(ours, ref) <= 1


# --------------------------------------------------------------- nlmeans ----

def test_nlmeans_gray_matches_cv2(rng):
    clean = cv2.cvtColor(cv2.resize(np.ascontiguousarray(
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)), (48, 48)),
        cv2.COLOR_RGB2GRAY)
    noisy = np.clip(clean.astype(np.float32)
                    + rng.normal(0, 10, clean.shape), 0, 255).astype(np.uint8)
    ours = ops.nl_means(noisy, h=10.0)
    ref = cv2.fastNlMeansDenoising(noisy, None, h=10,
                                   templateWindowSize=7, searchWindowSize=21)
    assert _maxdiff(ours, ref) <= 3


def test_nlmeans_colored_close_to_cv2(rng, test_image):
    small = cv2.resize(test_image, (64, 48))
    noisy = np.clip(small.astype(np.float32)
                    + rng.normal(0, 15, small.shape), 0, 255).astype(np.uint8)
    ours = np.asarray(ops.nl_means_colored(noisy, h=5.0, h_color=5.0))
    ref = cv2.fastNlMeansDenoisingColored(noisy, None, h=5, hColor=5,
                                          templateWindowSize=7,
                                          searchWindowSize=21)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 1.5
    assert (diff > 8).mean() < 0.01


def test_nlmeans_joint_lab_matches_two_pass(rng):
    """The joint single-pass Lab formulation (round 4, shares per-offset slab
    slices between the L and ab weight fields) must match two independent
    `_nl_means_f32` passes to f32 tolerance — it is a traffic optimization,
    not a math change."""
    from neural_enhanced_super_resolution_tpu.ops.nlmeans import (
        _nl_means_f32, _nl_means_lab_joint)
    import jax.numpy as jnp
    lab = rng.uniform(0, 255, (56, 72, 3)).astype(np.float32)
    joint = np.asarray(_nl_means_lab_joint(
        jnp.asarray(lab), jnp.float32(5.0), jnp.float32(7.0), 7, 21))
    L = np.asarray(_nl_means_f32(jnp.asarray(lab[:, :, :1]), jnp.float32(5.0),
                                 jnp.float32(0.0), 7, 21))
    ab = np.asarray(_nl_means_f32(jnp.asarray(lab[:, :, 1:]), jnp.float32(7.0),
                                  jnp.float32(0.0), 7, 21))
    np.testing.assert_allclose(joint, np.concatenate([L, ab], axis=-1),
                               atol=1e-3)


# ------------------------------------------------------ composite stages ----

def _cv2_preprocess(img, denoise_level=0.5):
    """The reference's _preprocess_image math (nesr.py:668-689) in cv2."""
    if denoise_level > 0:
        s = denoise_level * 10
        img = cv2.fastNlMeansDenoisingColored(img, None, h=s, hColor=s,
                                              templateWindowSize=7,
                                              searchWindowSize=21)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    l, a, b = cv2.split(lab)
    l = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(l)
    return cv2.cvtColor(cv2.merge((l, a, b)), cv2.COLOR_LAB2RGB)


def test_preprocess_stage_parity(rng, test_image):
    small = cv2.resize(test_image, (64, 48))
    noisy = np.clip(small.astype(np.float32)
                    + rng.normal(0, 10, small.shape), 0, 255).astype(np.uint8)
    ours = np.asarray(ops.preprocess(noisy, 0.5))
    ref = _cv2_preprocess(noisy, 0.5)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # Chained uint8 stages amplify the +-1 NL-means LUT differences through
    # CLAHE's per-tile histograms (tiles are only 48 px at this size), so the
    # chain tolerance is looser than the exact per-stage tests above.
    assert diff.mean() < 6.0
    mse = np.mean((ours.astype(np.float64) - ref.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 24.0


def test_adaptive_sharpen_parity(test_image):
    img = test_image
    ours = np.asarray(ops.adaptive_sharpen(img))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    variance = cv2.GaussianBlur(gray, (0, 0), 2)
    variance = cv2.subtract(gray, variance)
    variance = cv2.convertScaleAbs(variance)
    blurred = cv2.GaussianBlur(img, (0, 0), 3)
    sharpened = cv2.addWeighted(img, 1.5, blurred, -0.5, 0)
    _, vb = cv2.threshold(variance, 10, 255, cv2.THRESH_BINARY)
    alpha = vb.astype(np.float32) / 255.0
    ref = np.zeros_like(img)
    for c in range(3):
        ref[:, :, c] = img[:, :, c] * (1 - alpha) + sharpened[:, :, c] * alpha
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # Mask may differ at threshold boundary by 1 count; bulk must agree.
    assert (diff > 2).mean() < 0.02
    assert diff.mean() < 1.0


def test_masked_sharpen_parity(rng, test_image):
    img = cv2.resize(test_image, (80, 60))
    mask = (rng.random((60, 80)) > 0.5).astype(np.uint8)
    ours = np.asarray(ops.masked_sharpen(img, mask))
    dmask = cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=1)
    blurred = cv2.GaussianBlur(img, (0, 0), 3)
    sharpened = cv2.addWeighted(img, 1.5, blurred, -0.5, 0)
    ref = np.where(np.expand_dims(dmask, 2) == 1, sharpened, img)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 2


def test_ensemble_parity(rng):
    a = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (80, 100, 3), dtype=np.uint8)
    ours = np.asarray(ops.ensemble([a, b]))
    target_h, target_w = max([(im.shape[0], im.shape[1]) for im in (a, b)])
    al = [cv2.resize(a, (target_w, target_h), interpolation=cv2.INTER_LANCZOS4), b]
    acc = np.zeros_like(al[0], np.float32)
    for im in al:
        acc += im.astype(np.float32) * 0.5
    ref = acc.astype(np.uint8)
    assert _maxdiff(ours, ref) <= 1
    # single image passes through untouched
    assert np.array_equal(np.asarray(ops.ensemble([a])), a)
