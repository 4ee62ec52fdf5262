"""Quality metrics: PSNR and SSIM as jitted XLA ops.

The reference computes no numeric quality metrics anywhere (SURVEY.md §5
"Metrics"); the TPU build adds them — they back the degrade->enhance
round-trip tests and the benchmark quality gates (PSNR within 0.1 dB of the
reference, BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psnr", "ssim"]


@jax.jit
def psnr(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    a = jnp.asarray(a).astype(jnp.float32)
    b = jnp.asarray(b).astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


@jax.jit
def ssim(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Mean SSIM with the standard 11x11 sigma=1.5 Gaussian window.

    Accepts (H, W) or (H, W, C); channels are averaged.
    """
    a = jnp.asarray(a).astype(jnp.float32)
    b = jnp.asarray(b).astype(jnp.float32)
    if a.ndim == 2:
        a = a[:, :, None]
        b = b[:, :, None]
    win = _gaussian_window()
    k1, k2 = 0.01, 0.03
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    def blur2(x):
        # separable 11x11 gaussian, VALID, per channel (NHWC depthwise)
        c = x.shape[-1]
        kh = jnp.broadcast_to(win[:, None, None, None], (11, 1, 1, c))
        kw = jnp.broadcast_to(win[None, :, None, None], (1, 11, 1, c))
        y = jax.lax.conv_general_dilated(
            x[None], kh, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        y = jax.lax.conv_general_dilated(
            y, kw, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        return y[0]

    mu_a = blur2(a)
    mu_b = blur2(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_a2 = blur2(a * a) - mu_a2
    sigma_b2 = blur2(b * b) - mu_b2
    sigma_ab = blur2(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sigma_a2 + sigma_b2 + c2))
    return jnp.mean(s)
