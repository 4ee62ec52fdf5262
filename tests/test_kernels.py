"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.kernels.attention import (
    attention_auto, flash_attention)


def _ref_attention(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("s,block", [(256, 128), (300, 128), (128, 64)])
def test_flash_attention_matches_reference(rng, s, block):
    b, h, d = 1, 2, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=block,
                                     block_k=block))
    ref = _ref_attention(q, k, v)
    assert np.abs(out - ref).max() < 2e-5


def test_flash_attention_cross_lengths(rng):
    # Sq != Skv (cross-attention shape)
    b, h, d = 1, 2, 32
    q = rng.standard_normal((b, h, 200, d)).astype(np.float32)
    k = rng.standard_normal((b, h, 100, d)).astype(np.float32)
    v = rng.standard_normal((b, h, 100, d)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=128,
                                     block_k=64))
    ref = _ref_attention(q, k, v)
    assert np.abs(out - ref).max() < 2e-5


def test_attention_auto_dispatches_to_xla_when_masked(rng):
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        attention as xla_attention)
    b, s, dm, h = 1, 16, 32, 2
    q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    mask = jnp.zeros((1, 1, s, s))
    out = attention_auto(q, k, v, h, mask=mask, dtype=jnp.float32)
    ref = xla_attention(q, k, v, h, mask=mask, dtype=jnp.float32)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("apply_act", [True, False])
def test_conv3x3_kernel_matches_xla(rng, apply_act):
    """Experimental im2col conv kernel: exact vs lax.conv (interpret mode)."""
    from jax import lax
    from neural_enhanced_super_resolution_tpu.kernels.conv3x3 import (
        conv3x3_lrelu)
    x = jnp.asarray(rng.standard_normal((2, 37, 48, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    if apply_act:
        ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    out = conv3x3_lrelu(x, w, b, apply_act=apply_act, block_rows=8)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_conv3x3_v2_kernel_matches_xla(rng):
    """v2 (ky-unfold + lane-roll) im2col conv: exact in interpret mode."""
    from jax import lax
    from neural_enhanced_super_resolution_tpu.kernels.conv3x3_v2 import (
        conv3x3_lrelu_v2)
    x = jnp.asarray(rng.standard_normal((2, 21, 40, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    out = conv3x3_lrelu_v2(x, w, b, block_rows=8)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_flash_attention_padded_kv_with_extreme_scores(rng):
    """Padded KV rows must stay excluded even when every real score is very
    negative (ADVICE round 1: a -1e4 bias was reachable by real scores)."""
    import jax.numpy as jnp

    from neural_enhanced_super_resolution_tpu.kernels.attention import (
        flash_attention)

    b, h, d = 1, 1, 64
    sq, skv = 8, 100  # skv % block_k != 0 -> padding path
    # Construct q/k so every real score is ~ -2000 after 1/sqrt(d) scaling:
    # q = 16 * ones, k = -16 * ones -> q.k = -16*16*64 = -16384, scaled -2048.
    q = jnp.full((b, h, sq, d), 16.0, jnp.float32)
    k = jnp.full((b, h, skv, d), -16.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    out = flash_attention(q, k, v, block_q=8, block_k=64)
    # All real scores equal -> softmax uniform over REAL keys only.
    expected = jnp.mean(v, axis=2, keepdims=True).repeat(sq, axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-3)
