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


@pytest.mark.parametrize("s,block_k", [(320, 64), (300, 64)])
def test_flash_attention_kvgrid_matches_reference(rng, s, block_k,
                                                  monkeypatch):
    """KV-gridded lowering (KV footprint over the scoped-VMEM budget): the
    VAE mid-block's shape class — ONE head, d=512, S = the whole latent
    grid. s=300 exercises the padded-keys mask inside the gridded path.
    Unique shapes vs the other flash tests: the budget env is read at trace
    time, so a shape reused from a whole-KV test would hit that jit cache
    and never lower the gridded program."""
    monkeypatch.setenv("NESR_FLASH_KV_VMEM_MB", "0.5")
    b, h, d = 1, 1, 512
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=128,
                                     block_k=block_k))
    ref = _ref_attention(q, k, v)
    assert np.abs(out - ref).max() < 2e-5


def test_flash_attention_kvgrid_cross_lengths(rng, monkeypatch):
    monkeypatch.setenv("NESR_FLASH_KV_VMEM_MB", "0.25")
    b, h, d = 2, 1, 256
    q = rng.standard_normal((b, h, 200, d)).astype(np.float32)
    k = rng.standard_normal((b, h, 330, d)).astype(np.float32)
    v = rng.standard_normal((b, h, 330, d)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=64,
                                     block_k=128))
    ref = _ref_attention(q, k, v)
    assert np.abs(out - ref).max() < 2e-5


@pytest.mark.parametrize("bias", [False, True])
def test_fused_self_attention_matches_separate_path(rng, bias):
    """The fused-heads self-attention block (projections writing head-major
    directly, output projection contracting the head axis) is numerically
    the separate-projection path: same dots in a different index order.
    CPU run: flash_attention auto-interprets."""
    from neural_enhanced_super_resolution_tpu.kernels.attention import (
        _fused_self_attention_math)
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        attention as xla_attention, linear)
    b, s, c, h = 2, 256, 128, 4
    params = {}
    for role in ("q", "k", "v"):
        params[f"blk.to_{role}.weight"] = jnp.asarray(
            rng.standard_normal((c, c)) * 0.08, jnp.float32)
    params["blk.to_out.0.weight"] = jnp.asarray(
        rng.standard_normal((c, c)) * 0.08, jnp.float32)
    if bias:
        for role in ("q", "k", "v"):
            params[f"blk.to_{role}.bias"] = jnp.asarray(
                rng.standard_normal((c,)) * 0.1, jnp.float32)
        params["blk.to_out.0.bias"] = jnp.asarray(
            rng.standard_normal((c,)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)

    out = np.asarray(_fused_self_attention_math(
        x, params, "blk", h, dtype=jnp.float32, block_q=128, block_k=256))

    q = linear(x, params, "blk.to_q", dtype=jnp.float32)
    k = linear(x, params, "blk.to_k", dtype=jnp.float32)
    v = linear(x, params, "blk.to_v", dtype=jnp.float32)
    core = xla_attention(q, k, v, h, dtype=jnp.float32)
    ref = np.asarray(linear(core, params, "blk.to_out.0", dtype=jnp.float32))
    assert np.abs(out - ref).max() < 2e-4


def test_basic_transformer_fused_selfattn_matches_proj(rng, monkeypatch):
    """_basic_transformer under SELFATTN_FORM='fused' (gate forced past the
    TPU check) equals the separate-projection formulation end to end —
    residual adds, cross-attention, and feed-forward included — pinning the
    unet wiring of fused_self_attention (prefix naming, residual placement)."""
    import neural_enhanced_super_resolution_tpu.models.diffusion.unet as unet

    b, s, c, heads, ctx_dim = 1, 1024, 64, 2, 32
    params = {}
    for nrm in ("norm1", "norm2", "norm3"):
        params[f"blk.{nrm}.weight"] = jnp.ones((c,), jnp.float32)
        params[f"blk.{nrm}.bias"] = jnp.zeros((c,), jnp.float32)
    for role in ("q", "k", "v"):
        params[f"blk.attn1.to_{role}.weight"] = jnp.asarray(
            rng.standard_normal((c, c)) * 0.08, jnp.float32)
    params["blk.attn1.to_out.0.weight"] = jnp.asarray(
        rng.standard_normal((c, c)) * 0.08, jnp.float32)
    params["blk.attn1.to_out.0.bias"] = jnp.asarray(
        rng.standard_normal((c,)) * 0.1, jnp.float32)
    params["blk.attn2.to_q.weight"] = jnp.asarray(
        rng.standard_normal((c, c)) * 0.08, jnp.float32)
    for role in ("k", "v"):
        params[f"blk.attn2.to_{role}.weight"] = jnp.asarray(
            rng.standard_normal((ctx_dim, c)) * 0.08, jnp.float32)
    params["blk.attn2.to_out.0.weight"] = jnp.asarray(
        rng.standard_normal((c, c)) * 0.08, jnp.float32)
    params["blk.ff.net.0.proj.weight"] = jnp.asarray(
        rng.standard_normal((c, 4 * c)) * 0.08, jnp.float32)
    params["blk.ff.net.2.weight"] = jnp.asarray(
        rng.standard_normal((2 * c, c)) * 0.08, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    context = jnp.asarray(rng.standard_normal((b, 77, ctx_dim)), jnp.float32)

    # Force the TPU gate open for BOTH paths (flash auto-interprets on CPU):
    # the comparison is then purely projection-fused vs separate-projection.
    fake_tpu = [type("D", (), {"platform": "tpu"})()]
    monkeypatch.setattr(jax, "devices", lambda *a, **kw: fake_tpu)

    monkeypatch.setattr(unet, "SELFATTN_FORM", "proj")
    ref = np.asarray(unet._basic_transformer(
        params, "blk", x, context, heads, jnp.float32))
    monkeypatch.setattr(unet, "SELFATTN_FORM", "fused")
    out = np.asarray(unet._basic_transformer(
        params, "blk", x, context, heads, jnp.float32))
    assert np.abs(out - ref).max() < 2e-4


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


# ----------------------------------------------- fused whole-RDB (D-form) ---

def _mk_fused_rdb(nf, gc, seed=0):
    import jax
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)
    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=nf,
                        num_block=1, num_grow_ch=gc)
    params = fuse_rrdbnet_params(init_rrdbnet(jax.random.PRNGKey(seed), cfg))
    return {k: np.asarray(v[0]) for k, v in params["body"]["rdb1"].items()}


@pytest.mark.parametrize("nf,gc,h,w", [(8, 4, 24, 16), (8, 4, 36, 40),
                                       (64, 32, 32, 48)])
def test_rdb_dform_reference_matches_xla_fused(rng, nf, gc, h, w):
    """D-form weight relayout + XLA reference == the production fused RDB
    (bf16-materialisation differences only)."""
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import _rdb_fused
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        from_rows_s2d, to_rows_s2d)
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        dform_rdb_weights, rdb_dform_reference)

    rdb = _mk_fused_rdb(nf, gc)
    x = jnp.asarray(rng.normal(0, 0.5, (2, h, w, nf)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(_rdb_fused(
        x, {k: jnp.asarray(v) for k, v in rdb.items()}, gc, jnp.bfloat16),
        np.float32)
    wd = dform_rdb_weights(rdb)
    got = np.asarray(from_rows_s2d(rdb_dform_reference(
        to_rows_s2d(x), wd, gc)), np.float32)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(ref - got).max() / scale < 2e-2


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
@pytest.mark.parametrize("nf,gc,h,w", [(8, 4, 24, 16), (8, 4, 36, 40),
                                       (64, 32, 32, 48)])
def test_rdb_dform_kernel_exact_vs_reference(rng, nf, gc, h, w, variant):
    """The line-buffered Pallas kernel (interpret mode on CPU) matches its
    XLA oracle per variant, and the chainable I/O format keeps its halo
    zeros. v1 is bit-level; v2's single K=12C dot may round differently
    than the oracle's 3-part f32 sum at the bf16 cast, so it gets one-ulp
    slack. v3 = v2's stage body with the rolling carries on async DMA
    (started end-of-step, waited next prologue) — must be value-identical
    to v2."""
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        to_rows_s2d)
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        IOFF, dform_rdb_weights, from_dform, rdb_dform_call,
        rdb_dform_reference, to_dform)

    rdb = _mk_fused_rdb(nf, gc)
    wd = dform_rdb_weights(rdb)
    x = jnp.asarray(rng.normal(0, 0.5, (2, h, w, nf)).astype(np.float32),
                    jnp.bfloat16)
    t = to_rows_s2d(x)
    a, wcols = t.shape[1], t.shape[2]
    ref = np.asarray(rdb_dform_reference(t, wd, gc, v2=variant != "v1"),
                     np.float32)
    out = rdb_dform_call(to_dform(t), wd, a, wcols, interpret=True,
                         variant=variant)
    got = np.asarray(from_dform(out, a, wcols), np.float32)
    scale = max(1.0, np.abs(ref).max())
    tol = 1e-4 if variant == "v1" else 1e-2 * scale
    assert np.abs(ref - got).max() < tol

    halo = np.asarray(out, np.float32)
    halo[:, IOFF:IOFF + a, 8:8 + wcols, :] = 0
    assert np.abs(halo).max() == 0.0


def test_rrdbnet_forward_dform_matches_fused(rng):
    """Full forward with the dform trunk == the XLA fused trunk (bf16 tol)."""
    import jax
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, fuse_rrdbnet_params_dform,
        init_rrdbnet, rrdbnet_forward)

    cfg = RRDBNetConfig(num_in_ch=3, num_out_ch=3, scale=4, num_feat=8,
                        num_block=2, num_grow_ch=4)
    raw = init_rrdbnet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 20, 24, 3)).astype(np.float32))
    ref = np.asarray(rrdbnet_forward(
        fuse_rrdbnet_params(raw), x, cfg, "bfloat16"))
    got = np.asarray(rrdbnet_forward(
        fuse_rrdbnet_params_dform(raw), x, cfg, "bfloat16"))
    assert ref.shape == got.shape == (1, 80, 96, 3)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(ref - got).max() / scale < 3e-2


@pytest.mark.parametrize("w", [160, 300])
def test_rdb_dform_kernel_multi_column_blocks(rng, w):
    """Wide inputs walk multiple column blocks (compile-time bound): the
    8-col inter-block context margin and overhang masking must be exact."""
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        to_rows_s2d)
    from neural_enhanced_super_resolution_tpu.kernels.rdb_dform import (
        dform_rdb_weights, from_dform, pick_wbw, rdb_dform_call,
        rdb_dform_reference, to_dform)

    assert pick_wbw(w) < w  # really multi-block
    rdb = _mk_fused_rdb(8, 4)
    wd = dform_rdb_weights(rdb)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 24, w, 8)).astype(np.float32),
                    jnp.bfloat16)
    t = to_rows_s2d(x)
    a = t.shape[1]
    # v1 is bit-exact vs the oracle, which makes it the right variant for
    # asserting the column-blocking margins are EXACT (v2's K-concat dot
    # legitimately rounds differently at the bf16 cast).
    ref = np.asarray(rdb_dform_reference(t, wd, 4), np.float32)
    out = rdb_dform_call(to_dform(t), wd, a, w, interpret=True,
                         variant="v1")
    got = np.asarray(from_dform(out, a, w), np.float32)
    assert np.abs(ref - got).max() < 1e-4

    # v2 walks the same multi-block grid; its oracle gets bf16-ulp slack.
    ref2 = np.asarray(rdb_dform_reference(t, wd, 4, v2=True), np.float32)
    out2 = rdb_dform_call(to_dform(t), wd, a, w, interpret=True,
                          variant="v2")
    got2 = np.asarray(from_dform(out2, a, w), np.float32)
    scale = max(1.0, np.abs(ref2).max())
    assert np.abs(ref2 - got2).max() < 1e-2 * scale
