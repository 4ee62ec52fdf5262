"""Tensor-parallel (head/FF sharding) tests on the 8-virtual-CPU mesh.

SURVEY.md §2c TP row: shard UNet attention heads via sharding annotations.
These tests verify (a) the spec mapper picks Megatron-style specs, (b) a
TP-sharded UNet forward is numerically identical to the replicated one, and
(c) tensors whose dims don't divide the mesh degrade to replication.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from neural_enhanced_super_resolution_tpu.models.diffusion import (
    UNetConfig, unet_forward)
from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
    random_params, unet_param_shapes)
from neural_enhanced_super_resolution_tpu.parallel.tensor import (
    shard_transformer_params, tp_mesh, tp_spec_for)

TINY = UNetConfig(
    sample_size=16, in_channels=7, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=16, attention_head_dim=2, num_class_embeds=50,
    norm_num_groups=4)


def test_tp_spec_mapping():
    mesh = tp_mesh(2)
    name = "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight"
    assert tp_spec_for(name, (16, 16), mesh) == P(None, "tp")
    out = "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0" \
          ".weight"
    assert tp_spec_for(out, (16, 16), mesh) == P("tp", None)
    ff0 = "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight"
    assert tp_spec_for(ff0, (16, 128), mesh) == P(None, "tp")
    ff2 = "mid_block.attentions.0.transformer_blocks.0.ff.net.2.weight"
    assert tp_spec_for(ff2, (64, 16), mesh) == P("tp", None)
    # conv / norm tensors replicate
    assert tp_spec_for("down_blocks.0.resnets.0.conv1.weight",
                       (3, 3, 8, 8), mesh) == P()
    # non-dividing dims degrade to replication instead of erroring
    assert tp_spec_for(name, (16, 9), mesh) == P()


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_unet_forward_matches_replicated(tp):
    key = jax.random.PRNGKey(0)
    params = random_params(unet_param_shapes(TINY), key, scale=0.05)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 7)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)

    ref = np.asarray(unet_forward(params, x, jnp.int32(3), ctx,
                                  jnp.int32([20]), TINY, "float32"))

    mesh = tp_mesh(tp)
    sharded = shard_transformer_params(params, mesh)
    # at least the attention projections must actually be sharded
    qname = ("down_blocks.1.attentions.0.transformer_blocks.0"
             ".attn1.to_q.weight")
    spec = sharded[qname].sharding.spec
    assert spec == P(None, "tp"), spec

    got = np.asarray(unet_forward(sharded, x, jnp.int32(3), ctx,
                                  jnp.int32([20]), TINY, "float32"))
    assert np.allclose(ref, got, atol=2e-5), np.abs(ref - got).max()


def test_tp_sharding_survives_jit_compile():
    """The TP forward compiles into one SPMD program (no per-shard python)."""
    key = jax.random.PRNGKey(0)
    params = random_params(unet_param_shapes(TINY), key, scale=0.05)
    mesh = tp_mesh(2)
    sharded = shard_transformer_params(params, mesh)
    x = jnp.zeros((1, 16, 16, 7), jnp.float32)
    ctx = jnp.zeros((1, 6, 16), jnp.float32)

    fn = jax.jit(lambda p, x, c: unet_forward(
        p, x, jnp.int32(1), c, jnp.int32([0]), TINY, "float32"))
    out = fn(sharded, x, ctx)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
