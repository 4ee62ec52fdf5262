"""Pallas flash attention for TPU (used by the diffusion UNet's self-attention
on large latent grids).

Online-softmax blocked attention: Q blocks stream over KV blocks entirely in
VMEM, never materialising the (S, S) score matrix — the standard
flash-attention recipe expressed in Pallas (see /opt/skills/guides/
pallas_guide.md: grid/BlockSpec, VMEM scratch, fori_loop). Falls back to the
XLA einsum path (models/diffusion/layers.attention) for short sequences or
non-TPU backends, where plain XLA is faster than kernel launch overhead.

FLOP layout: per (batch*head, Sq, d) block the kernel runs two MXU matmuls
(QK^T and PV) with f32 accumulators in VMEM scratch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention_auto", "fused_self_attention"]

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, block_k: int, sm_scale: float):
    """One (batch*head, q_block) program: stream KV blocks with online
    softmax. Refs are (1, bq, d) / (1, Skv, d) VMEM blocks."""
    skv = k_ref.shape[1]
    num_kv = skv // block_k

    m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    # Dots run in the INPUT dtype with f32 accumulation (bf16 operands in
    # production — attention_auto casts). Measured EQUAL to the previous
    # explicit-f32-operand version on the whole UNet step (39.7 vs
    # 39.2 ms — RESULTS.md round-4 flash-dtype record): the kernel is not
    # matmul-rate-bound at these shapes. Kept because it matches the XLA
    # einsum path's bf16 precision and lets Mosaic skip the upcast. The
    # sm_scale fold happens on the f32 scores (more accurate than
    # pre-scaling a bf16 q); softmax arithmetic stays f32.
    q = q_ref[0]

    def body(ki, _):
        k_blk = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (bq, block_k)

        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])

        l_new = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, 0] = m_new
        l_scr[:, 0] = l_new
        return 0

    lax.fori_loop(0, num_kv, body, 0)
    o_ref[0] = (acc_scr[:] / l_scr[:, 0][:, None]).astype(o_ref.dtype)


def _flash_kernel_kvgrid(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                         *, sm_scale: float):
    """One (batch*head, q_block, kv_block) program: the kv axis is a GRID
    dimension instead of an in-VMEM fori_loop, so only ONE (block_k, d) K/V
    tile is VMEM-resident at a time. Used when the whole-KV footprint would
    blow the scoped-VMEM budget (the VAE mid-block attention: a single head
    of d=512 over S=25600+ tokens is ~30 MB of KV — the round-4 "VAE decode
    fails at 160px latents" hole). Online-softmax state (m, l, acc) carries
    across kv grid steps in scratch; the q/head grid dims are declared
    parallel, the kv dim arbitrary (sequential), per the standard TPU flash
    recipe."""
    kk = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, block_k)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])

    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:, 0] = m_new

    @pl.when(kk == nkv - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0][:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def _flash_attention_impl(q, k, v, block_q, block_k, interpret):
    return _flash_attention_body(q, k, v, block_q, block_k, interpret)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 256, block_k: int = 4096,
                    interpret: bool | None = None) -> jax.Array:
    """Defaults are the measured v5e optimum at the UNet's shapes: a LARGE
    block_k (clamped to the sequence) minimises online-softmax rescale
    passes — at 4096 tokens the whole KV runs in ONE pass, taking the
    split-CFG UNet step from 39.6 to 26.8 ms (RESULTS.md round-4 flash
    block sweep). VMEM at (256, 4096): 4 MB f32 scores + ~1 MB KV."""
    if interpret is None:
        # Pallas compiles only on TPU; elsewhere run the interpreter (tests).
        interpret = jax.default_backend() != "tpu"
    return _flash_attention_impl(q, k, v, block_q, block_k, interpret)


def _flash_attention_body(q: jax.Array, k: jax.Array, v: jax.Array,
                          block_q: int, block_k: int,
                          interpret: bool) -> jax.Array:
    """(B, H, Sq, d) x (B, H, Skv, d) -> (B, H, Sq, d), no mask.

    Sq must divide block_q and Skv divide block_k after internal padding
    (handled here with -inf-free zero padding: padded KV rows contribute
    exp(-inf)=0 via a large negative score bias folded into K padding).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d)

    # Clamp blocks to the (tile-rounded) sequence lengths so a large
    # default block_k (fewer online-softmax rescale passes — measured 1.45x
    # on the UNet step, RESULTS.md round-4 flash block sweep) never pads a
    # SHORT sequence up to the block size. Lane/sublane granularity: 128
    # for the minor (kv) dim, 16 sublanes for the q dim (bf16-safe).
    block_k = max(128, min(block_k, -(-skv // 128) * 128))
    block_q = max(16, min(block_q, -(-sq // 16) * 16))

    # Pad sequence dims to block multiples. Padded KV entries must not
    # contribute: give them a score of -inf by padding K with zeros and
    # masking via a huge negative bias added to padded V rows' scores —
    # simplest robust trick: pad K with zeros and rely on an explicit bias
    # is complex in-kernel; instead pad K with a row whose dot with any q is
    # constant, then subtract. We choose exact masking: pad then set scores
    # via value -inf using a validity trick below.
    pq = (-sq) % block_q
    pk = (-skv) % block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    if pk:
        # Exact mask for padded keys: append a large negative component on an
        # extra feature dimension. q gets +1 on that dim, padded k gets -BIG,
        # real k gets 0 -> padded scores ~ -BIG/sqrt(d), exp -> 0. BIG must
        # still dominate after the 1/sqrt(d) scale and any real score
        # (|s| <= d*max|q|*max|k|/sqrt(d)), so use 1e9, not 1e4
        # (ADVICE.md round 1: -1e4/sqrt(64) ~ -1250 is reachable by real
        # scores, letting zero-valued padded rows capture softmax mass).
        extra_q = jnp.ones((b, h, sq + pq, 1), q.dtype)
        valid = jnp.concatenate([
            jnp.zeros((b, h, skv, 1), k.dtype),
            jnp.full((b, h, pk, 1), -1e9, k.dtype)], axis=2)
        qp = jnp.concatenate([qp, extra_q], axis=-1)
        kp = jnp.concatenate([kp, valid], axis=-1)
        dk = d + 1
    else:
        dk = d

    bh = b * h
    qp = qp.reshape(bh, sq + pq, dk)
    kp = kp.reshape(bh, skv + pk, dk)
    vp = vp.reshape(bh, skv + pk, d)

    # Two lowerings, one math. Whole-KV-in-VMEM (the measured v5e optimum at
    # the UNet's shapes: one K/V DMA per q block, fewest rescale passes) when
    # the padded K+V footprint fits the scoped-VMEM budget; otherwise the kv
    # axis becomes a grid dimension streaming (block_k, d) tiles (the VAE
    # mid-block's single-head d=512 attention over the full latent grid —
    # ~30 MB of KV at 160px latents — needs this or fails to compile).
    import os

    kv_mb = (skv + pk) * (dk + d) * qp.dtype.itemsize / (1 << 20)
    budget_mb = float(os.environ.get("NESR_FLASH_KV_VMEM_MB", 8))

    if kv_mb <= budget_mb:
        grid = (bh, (sq + pq) // block_q)
        out = pl.pallas_call(
            functools.partial(_flash_kernel, block_k=block_k,
                              sm_scale=sm_scale),
            out_shape=jax.ShapeDtypeStruct((bh, sq + pq, d), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dk), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, skv + pk, dk), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, skv + pk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            interpret=interpret,
        )(qp, kp, vp)
    else:
        grid = (bh, (sq + pq) // block_q, (skv + pk) // block_k)
        out = pl.pallas_call(
            functools.partial(_flash_kernel_kvgrid, sm_scale=sm_scale),
            out_shape=jax.ShapeDtypeStruct((bh, sq + pq, d), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dk), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dk), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda i, j, kk: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(qp, kp, vp)
    return out.reshape(b, h, sq + pq, d)[:, :, :sq, :]


def _flash_gate(seq_len: int, min_seq_for_flash: int) -> bool:
    """Single source of truth for when the flash kernel engages (shared by
    attention_auto and fused_self_attention so the two paths can never
    silently diverge — ADVICE round 4): TPU backend, sequence at least
    min_seq_for_flash, and NESR_DISABLE_FLASH_ATTENTION unset. The env
    escape hatch exists for tensor-parallel runs: the flash kernel is a
    custom call GSPMD cannot partition over a head-sharded tp axis, while
    the XLA einsum path shards cleanly (parallel/tensor.py)."""
    import os

    if os.environ.get("NESR_DISABLE_FLASH_ATTENTION") == "1":
        return False
    if not any(d.platform == "tpu" for d in jax.devices()):
        return False
    return seq_len >= min_seq_for_flash


def _flash_blocks() -> tuple[int, int]:
    """Block-geometry tuning surface (benchmarks/envelope_unet_batch.py
    sweep); defaults are the measured v5e optimum at the UNet's shapes."""
    import os

    return (int(os.environ.get("NESR_FLASH_BLOCK_Q", 256)),
            int(os.environ.get("NESR_FLASH_BLOCK_K", 4096)))


def attention_auto(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
                   mask: jax.Array | None = None,
                   dtype=jnp.bfloat16,
                   min_seq_for_flash: int = 1024) -> jax.Array:
    """Drop-in for layers.attention: flash kernel when profitable.

    Inputs (B, S, D) packed heads; mask forces the XLA path (the UNet's only
    masked attention is CLIP's causal text tower at S=77, where flash is not
    worth it).
    """
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        attention as xla_attention)

    b, sq, dm = q.shape
    if mask is not None or not _flash_gate(sq, min_seq_for_flash):
        return xla_attention(q, k, v, num_heads, mask=mask, dtype=dtype)
    hd = dm // num_heads
    skv = k.shape[1]
    bq, bk = _flash_blocks()
    qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    out = flash_attention(qh.astype(dtype), kh.astype(dtype),
                          vh.astype(dtype), block_q=bq, block_k=bk)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, dm).astype(jnp.float32)


def _fused_self_attention_math(h: jax.Array, params: dict, prefix: str,
                               num_heads: int, dtype=jnp.bfloat16,
                               block_q: int = 256,
                               block_k: int = 4096) -> jax.Array:
    """q/k/v projections -> flash -> out projection, head split fused.

    The projections write head-major DIRECTLY — einsum('bsc,chd->bhsd') —
    and the output projection contracts ('bhsd,hdc->bsc'), so the four HBM
    relayouts the attention_auto path pays per layer (q/k/v transposed into
    (B, H, S, d) and the output back) become the matmuls' own output/input
    indexing instead of separate copy passes over the big latent tensors.
    Dots, bias adds, and the flash kernel itself are unchanged, so numerics
    match linear()+attention_auto to f32-accumulation rounding
    (tests/test_kernels.py pins the equivalence)."""
    b, s, c = h.shape
    hd = c // num_heads
    x = h.astype(dtype)

    def project(role):
        w = params[f"{prefix}.to_{role}.weight"].astype(dtype)
        y = jnp.einsum("bsc,chd->bhsd", x, w.reshape(c, num_heads, hd),
                       preferred_element_type=jnp.float32)
        bias = params.get(f"{prefix}.to_{role}.bias")
        if bias is not None:
            y = y + bias.astype(jnp.float32).reshape(1, num_heads, 1, hd)
        return y.astype(dtype)

    out = flash_attention(project("q"), project("k"), project("v"),
                          block_q=block_q, block_k=block_k)
    wo = params[f"{prefix}.to_out.0.weight"].astype(dtype)
    y = jnp.einsum("bhsd,hdc->bsc", out.astype(dtype),
                   wo.reshape(num_heads, hd, c),
                   preferred_element_type=jnp.float32)
    bias = params.get(f"{prefix}.to_out.0.bias")
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def fused_self_attention(h: jax.Array, params: dict, prefix: str,
                         num_heads: int, dtype=jnp.bfloat16,
                         min_seq_for_flash: int = 1024) -> jax.Array | None:
    """Whole self-attention block with head-major projections (see
    _fused_self_attention_math). Returns None when the flash gate fails
    (short sequence / non-TPU / flash disabled) so the caller falls back to
    the separate-projection attention_auto path.

    Decision record (RESULTS.md round 4): the alternative — a head-gridded
    Pallas kernel over the natural (B, S, H, d) layout with (1, bq, 1, d)
    blocks — cannot lower on TPU at all: Mosaic requires block shapes whose
    second-to-minor dim is a multiple of 8 or the full array dim, so
    singleton head blocks are structurally illegal. Fusing the relayout
    into the projection matmuls needs no new kernel."""
    if not _flash_gate(h.shape[1], min_seq_for_flash):
        return None
    bq, bk = _flash_blocks()
    return _fused_self_attention_math(h, params, prefix, num_heads,
                                      dtype=dtype, block_q=bq, block_k=bk)
