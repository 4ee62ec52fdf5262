"""SegFormer parity vs. HuggingFace transformers (random-init, local-only).

transformers is installed in the image, so the real HF SegFormer
implementation (torch) serves as the golden model: instantiate a tiny config
with random weights, convert its state dict with our generic converter, and
require logits parity. This validates the exact code path the published
nvidia/segformer-b0 checkpoint will take (SURVEY.md §2b row "SegFormer-b0").
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
    convert_state_dict)
from neural_enhanced_super_resolution_tpu.models.segformer import (
    SegFormerConfig, SegFormerModel, segformer_logits,
    segformer_param_shapes)


@pytest.fixture(scope="module")
def tiny_hf_segformer():
    hf_cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[1, 1, 1, 1],
        sr_ratios=[4, 2, 2, 1], hidden_sizes=[8, 16, 16, 32],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 2, 4], mlp_ratios=[2, 2, 2, 2],
        decoder_hidden_size=16, num_labels=10)
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    return hf_cfg, model


def test_segformer_logits_match_hf(tiny_hf_segformer):
    hf_cfg, model = tiny_hf_segformer
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(sd)
    cfg = SegFormerConfig(**hf_cfg.to_dict())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits
    ref = ref.numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(segformer_logits(params, jnp.asarray(x), cfg,
                                       "float32"))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 2e-3


def test_segformer_spec_matches_hf_keys(tiny_hf_segformer):
    hf_cfg, model = tiny_hf_segformer
    cfg = SegFormerConfig(**hf_cfg.to_dict())
    spec = segformer_param_shapes(cfg)
    hf_keys = {k for k in model.state_dict().keys()
               if not k.endswith("num_batches_tracked")}
    ours = set(spec.keys())
    assert ours == hf_keys, (
        f"missing={sorted(hf_keys - ours)[:5]} "
        f"extra={sorted(ours - hf_keys)[:5]}")


def test_segment_wrapper_protocol(tiny_hf_segformer):
    hf_cfg, model = tiny_hf_segformer
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(sd)
    cfg = SegFormerConfig(**hf_cfg.to_dict())
    seg_model = SegFormerModel(params, cfg, "float32", input_size=64)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (100, 80, 3), dtype=np.uint8)
    seg = seg_model.segment(img)
    assert seg.shape == (100, 80)
    assert seg.dtype == np.int32
    assert seg.min() >= 0 and seg.max() < 10


def test_superres_pipeline_uses_segmentation(tiny_hf_segformer, tmp_path,
                                             test_image):
    """Segmentation-guided enhancement plugs into the main pipeline."""
    import os
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    from neural_enhanced_super_resolution_tpu.models.segformer import (
        SegFormerModel)
    from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
        convert_state_dict)

    hf_cfg, model = tiny_hf_segformer
    # Save an HF-layout snapshot and load through the real loader.
    snap = tmp_path / "segformer"
    model.save_pretrained(str(snap), safe_serialization=True)

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_esrgan": False, "use_diffusion": False,
        "denoise_level": 0, "adaptive_sharpening": False,
        "segment_enhancement": True,
        "segmentation_model_path": str(snap),
        "output_dir": str(tmp_path / "out")})
    out = pipe.enhance_array(test_image[:40, :40])
    assert "segmentation" in pipe.models
    # seg branch runs before upscale; bicubic floor gives 2x
    assert out.shape == (80, 80, 3)
