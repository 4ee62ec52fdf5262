"""SwinIR parity and integration tests.

The reference documents use_swinir but ships only a placeholder
(/root/reference/nesr/nesr.py:37, standalone/superres_project.py:288-296);
here it is a real model, validated against an independent torch twin
(tests/torch_twin_swinir.py) consuming the SAME state dict.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from neural_enhanced_super_resolution_tpu.models.swinir import (
    SwinIRConfig, SwinIRModel, init_swinir, swinir_forward,
    swinir_param_shapes, swinir_params_from_state_dict)

TINY = SwinIRConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                    window_size=4, mlp_ratio=2.0, num_feat=8,
                    upsampler="nearest+conv", scale=4)
TINY_PS = SwinIRConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                       window_size=4, mlp_ratio=2.0, num_feat=8,
                       upsampler="pixelshuffle", scale=2)


def _to_torch_sd(params):
    sd = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if name.endswith(".weight") and a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)                    # HWIO -> OIHW
        elif name.endswith(".weight") and a.ndim == 2 and \
                "bias_table" not in name:
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))
    return sd


@pytest.mark.parametrize("cfg,h,w", [(TINY, 12, 16), (TINY_PS, 8, 8),
                                     (TINY, 10, 14)])  # 10x14: pad path
def test_swinir_matches_torch_twin(cfg, h, w):
    from tests.torch_twin_swinir import torch_swinir_forward

    params = init_swinir(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)

    ours = np.asarray(swinir_forward(params, jnp.asarray(x), cfg,
                                     "float32"))
    with torch.no_grad():
        ref = torch_swinir_forward(
            _to_torch_sd(params),
            torch.from_numpy(x.transpose(0, 3, 1, 2)), cfg)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (1, h * cfg.scale, w * cfg.scale, 3)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


def test_swinir_state_dict_roundtrip(tmp_path):
    """Official-layout .pth (params_ema wrapper, OIHW) loads and infers
    the architecture from the checkpoint alone."""
    from neural_enhanced_super_resolution_tpu.models.swinir import (
        load_swinir)

    params = init_swinir(jax.random.PRNGKey(1), TINY)
    sd = _to_torch_sd(params)
    # buffers the converter must drop
    sd["layers.0.residual_group.blocks.1.attn_mask"] = torch.zeros(4, 16, 16)
    path = str(tmp_path / "swinir_tiny.pth")
    torch.save({"params_ema": sd}, path)

    model = load_swinir(path, compute_dtype="float32", cfg=TINY)
    out = model.upscale_batch(np.zeros((1, 8, 8, 3), np.uint8))
    assert out.shape == (1, 32, 32, 3) and out.dtype == jnp.uint8

    # cfg inference path (no cfg given)
    model2 = load_swinir(path, compute_dtype="float32")
    assert model2.cfg.embed_dim == TINY.embed_dim
    assert model2.cfg.depths == TINY.depths
    assert model2.cfg.window_size == TINY.window_size
    assert model2.cfg.upsampler == "nearest+conv"
    assert model2.cfg.scale == 4


def test_swinir_cfg_inference_pixelshuffle_x2(tmp_path):
    """A classical x2 pixelshuffle checkpoint infers scale=2 from the
    upsample conv indices (one conv per 2x stage)."""
    from neural_enhanced_super_resolution_tpu.models.swinir import (
        load_swinir)

    params = init_swinir(jax.random.PRNGKey(4), TINY_PS)
    path = str(tmp_path / "swinir_ps_x2.pth")
    torch.save({"params": _to_torch_sd(params)}, path)
    model = load_swinir(path, compute_dtype="float32")
    assert model.cfg.upsampler == "pixelshuffle"
    assert model.cfg.scale == 2
    out = model.upscale_batch(np.zeros((1, 8, 8, 3), np.uint8))
    assert out.shape == (1, 16, 16, 3)


def test_swinir_param_spec_matches_init():
    spec = swinir_param_shapes(TINY)
    params = init_swinir(jax.random.PRNGKey(0), TINY)
    assert set(spec) == set(params)
    for k, s in spec.items():
        assert tuple(params[k].shape) == tuple(s), k


def test_pipeline_swinir_branch(tmp_path, test_image):
    """use_swinir engages the third ensemble branch end-to-end (the
    standalone's intended flow, superres_project.py:158-163)."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "use_esrgan": False,
        "use_swinir": True, "denoise_level": 0,
        "adaptive_sharpening": False,
        "output_dir": str(tmp_path / "out")})
    pipe.models["swinir"] = SwinIRModel(
        init_swinir(jax.random.PRNGKey(0), TINY), TINY, "float32")
    out = pipe.enhance_array(test_image[:24, :24])
    assert "swinir" in pipe.models
    assert out.shape == (96, 96, 3)  # x4 branch drove the ensemble


def test_pipeline_three_branch_ensemble(tmp_path, test_image):
    """ESRGAN + SwinIR both feed the ensemble (the multi-model average the
    reference only reaches with two branches)."""
    import torch as _torch

    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet)

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "use_esrgan": True,
        "use_swinir": True, "denoise_level": 0,
        "adaptive_sharpening": False,
        "output_dir": str(tmp_path / "out")})
    ecfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8,
                         num_block=1, num_grow_ch=4)
    pipe.models["esrgan"] = {
        "params": fuse_rrdbnet_params(init_rrdbnet(jax.random.PRNGKey(3),
                                                   ecfg)),
        "cfg": ecfg}
    pipe.models["swinir"] = SwinIRModel(
        init_swinir(jax.random.PRNGKey(0), TINY), TINY, "float32")
    out = pipe.enhance_array(test_image[:24, :24])
    assert out.shape == (96, 96, 3)
    assert pipe.timer.totals.get("swinir", 0) > 0  # branch actually ran


def test_pipeline_swinir_sharded_matches_single(tmp_path, test_image):
    """The SwinIR branch rides the same DP mesh machinery as ESRGAN:
    data_parallel auto == off, bit-exact, on the 8-device CPU mesh."""
    import jax as _jax

    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    assert _jax.device_count() >= 8
    outs = {}
    for dp in ("auto", "off"):
        pipe = SuperResolutionPipeline(device="cpu", config={
            "iterations": 1, "use_diffusion": False,
            "segment_enhancement": False, "use_esrgan": False,
            "use_swinir": True, "denoise_level": 0,
            "adaptive_sharpening": False, "data_parallel": dp,
            "enable_tiling": True, "max_megapixels": 0.0001,
            "max_tile_size": 16, "tile_halo": 4,
            "output_dir": str(tmp_path / f"out_{dp}")})
        pipe.models["swinir"] = SwinIRModel(
            init_swinir(jax.random.PRNGKey(0), TINY), TINY, "float32")
        outs[dp] = pipe.enhance_array(test_image[:64, :64])
    assert np.array_equal(outs["auto"], outs["off"])


def test_swinir_branch_uses_own_tile_batch(tmp_path, test_image):
    """The SwinIR branch tiles at swinir_tile_batch (default 1), not the
    trunk's tile_batch=16: its HBM-bound attention glue scales with batch
    (measured optimum b=1 at 288-px tiles, swinir_batch_sweep.py)."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "use_esrgan": False,
        "use_swinir": True, "denoise_level": 0,
        "adaptive_sharpening": False, "data_parallel": "off",
        "enable_tiling": True, "max_megapixels": 0.0001,
        "max_tile_size": 16, "tile_halo": 4,
        "output_dir": str(tmp_path / "out")})
    pipe.models["swinir"] = SwinIRModel(
        init_swinir(jax.random.PRNGKey(0), TINY), TINY, "float32")
    assert pipe.config["tile_batch"] == 16        # trunk default untouched
    seen = {}
    orig = pipe._run_tiled

    def spy(model_fn, image, **kw):
        seen.update(kw)
        return orig(model_fn, image, **kw)

    pipe._run_tiled = spy
    out = pipe.enhance_array(test_image[:64, :64])
    assert out.shape == (256, 256, 3)
    assert seen.get("batch_tiles") == 1

    # and the override key is honoured
    pipe2 = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "use_esrgan": False,
        "use_swinir": True, "denoise_level": 0,
        "adaptive_sharpening": False, "data_parallel": "off",
        "enable_tiling": True, "max_megapixels": 0.0001,
        "max_tile_size": 16, "tile_halo": 4, "swinir_tile_batch": 4,
        "output_dir": str(tmp_path / "out2")})
    pipe2.models["swinir"] = pipe.models["swinir"]
    seen2 = {}
    orig2 = pipe2._run_tiled

    def spy2(model_fn, image, **kw):
        seen2.update(kw)
        return orig2(model_fn, image, **kw)

    pipe2._run_tiled = spy2
    out2 = pipe2.enhance_array(test_image[:64, :64])
    assert seen2.get("batch_tiles") == 4
    assert np.array_equal(out, out2)   # batch size never changes pixels


def test_pipeline_swinir_missing_weights_degrades(tmp_path, test_image):
    """No checkpoint -> feature disabled, pipeline continues (ladder)."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_diffusion": False,
        "segment_enhancement": False, "use_esrgan": False,
        "use_swinir": True, "denoise_level": 0,
        "adaptive_sharpening": False,
        "swinir_model_path": str(tmp_path / "missing.pth"),
        "output_dir": str(tmp_path / "out")})
    out = pipe.enhance_array(test_image[:24, :24])
    assert "swinir" not in pipe.models
    assert out.shape == (48, 48, 3)  # bicubic floor (x2)
