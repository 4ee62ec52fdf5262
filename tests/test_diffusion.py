"""Diffusion stack tests: scheduler math, block-level torch parity, and the
full tiny-checkpoint pipeline round trip."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models.diffusion import (
    CLIPTextConfig, DDIMScheduler, DDPMScheduler, UNetConfig, VAEConfig,
    clip_text_forward, load_upscale_pipeline, unet_forward, vae_decode)
from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
    clip_param_shapes, random_params, unet_param_shapes, validate_params,
    vae_param_shapes)

TINY_UNET = UNetConfig(
    sample_size=16, in_channels=7, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=16, attention_head_dim=2, num_class_embeds=50,
    norm_num_groups=4)

TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     latent_channels=4, norm_num_groups=4,
                     scaling_factor=0.08333)

TINY_CLIP = CLIPTextConfig(vocab_size=100, hidden_size=16,
                           intermediate_size=32, num_hidden_layers=2,
                           num_attention_heads=2, max_position_embeddings=12)


# ------------------------------------------------------------ schedulers ----

def test_ddpm_add_noise_formula():
    s = DDPMScheduler(num_train_timesteps=100)
    x0 = jnp.ones((2, 4, 4, 1))
    eps = jnp.full((2, 4, 4, 1), 0.5)
    t = jnp.int32(10)
    got = s.add_noise(x0, eps, t)
    a_bar = float(s.alphas_cumprod[10])
    want = np.sqrt(a_bar) * 1.0 + np.sqrt(1 - a_bar) * 0.5
    assert np.allclose(np.asarray(got), want, atol=1e-6)


def test_ddim_recovers_x0_with_perfect_eps():
    s = DDIMScheduler(num_train_timesteps=100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    t = jnp.int32(50)
    xt = s.add_noise(x0, eps, t)
    # One DDIM step with the true eps and prev_t = -1 (a_bar_prev = 1)
    # must land exactly on x0.
    x_prev = s.step(eps, t, jnp.int32(-1), xt)
    assert np.allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-5)


def test_timesteps_descending_and_in_range():
    for s in (DDPMScheduler(), DDIMScheduler()):
        ts = s.timesteps(20)
        assert len(ts) == 20
        assert (np.diff(ts) < 0).all()
        assert ts.max() < 1000 and ts.min() >= 0


def test_scaled_linear_betas_match_sd_convention():
    s = DDPMScheduler(beta_start=0.0001, beta_end=0.02,
                      beta_schedule="scaled_linear")
    betas = np.asarray(s.betas)
    assert np.isclose(betas[0], 0.0001, rtol=1e-3)
    assert np.isclose(betas[-1], 0.02, rtol=1e-3)
    # sqrt-space linearity
    sq = np.sqrt(betas)
    assert np.allclose(np.diff(sq), sq[1] - sq[0], rtol=1e-3)


# ------------------------------------------------- torch parity (blocks) ----

def test_resnet_block_matches_torch():
    """Our _resnet vs. an independently written torch resnet block."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        _resnet)
    cin, cout, td, g = 8, 8, 16, 4
    torch.manual_seed(0)
    tnorm1 = torch.nn.GroupNorm(g, cin)
    tconv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
    ttime = torch.nn.Linear(td, cout)
    tnorm2 = torch.nn.GroupNorm(g, cout)
    tconv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
    for m in (tnorm1, tconv1, ttime, tnorm2, tconv2):
        for p in m.parameters():
            torch.nn.init.normal_(p, std=0.3)

    params = {
        "r.norm1.weight": jnp.asarray(tnorm1.weight.detach().numpy()),
        "r.norm1.bias": jnp.asarray(tnorm1.bias.detach().numpy()),
        "r.conv1.weight": jnp.asarray(
            tconv1.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "r.conv1.bias": jnp.asarray(tconv1.bias.detach().numpy()),
        "r.time_emb_proj.weight": jnp.asarray(
            ttime.weight.detach().numpy().T),
        "r.time_emb_proj.bias": jnp.asarray(ttime.bias.detach().numpy()),
        "r.norm2.weight": jnp.asarray(tnorm2.weight.detach().numpy()),
        "r.norm2.bias": jnp.asarray(tnorm2.bias.detach().numpy()),
        "r.conv2.weight": jnp.asarray(
            tconv2.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "r.conv2.bias": jnp.asarray(tconv2.bias.detach().numpy()),
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 5, cin)).astype(np.float32)
    temb = rng.standard_normal((1, td)).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(temb)
        h = torch.nn.functional.silu(tnorm1(tx))
        h = tconv1(h)
        h = h + ttime(torch.nn.functional.silu(tt))[:, :, None, None]
        h = torch.nn.functional.silu(tnorm2(h))
        h = tconv2(h)
        ref = (tx + h).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(_resnet(params, "r", jnp.asarray(x), jnp.asarray(temb),
                              g, jnp.float32))
    assert np.abs(ours - ref).max() < 1e-4


def test_clip_attention_matches_torch_mha():
    """Our attention vs torch scaled_dot_product_attention with causal mask."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        attention)
    rng = np.random.default_rng(1)
    b, s, d, h = 2, 7, 16, 2
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    mask = np.where(np.arange(s)[None, :] <= np.arange(s)[:, None], 0.0,
                    -np.inf).astype(np.float32)
    ours = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), h,
                                mask=jnp.asarray(mask)[None, None],
                                dtype=jnp.float32))
    with torch.no_grad():
        tq = torch.from_numpy(q).view(b, s, h, d // h).transpose(1, 2)
        tk = torch.from_numpy(k).view(b, s, h, d // h).transpose(1, 2)
        tv = torch.from_numpy(v).view(b, s, h, d // h).transpose(1, 2)
        ref = torch.nn.functional.scaled_dot_product_attention(
            tq, tk, tv, is_causal=True)
        ref = ref.transpose(1, 2).reshape(b, s, d).numpy()
    assert np.abs(ours - ref).max() < 1e-4


def test_attention_qmajor_matches_bhqk():
    """The q-major cross-attention formulation (production default on the
    UNet's skv=77 text context — RESULTS.md round-4 cross-attention record)
    is numerically the same attention, including the bhqk mask convention."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.layers import (
        attention, attention_qmajor)
    rng = np.random.default_rng(3)
    b, sq, skv, d, h = 2, 9, 5, 16, 2
    q = jnp.asarray(rng.standard_normal((b, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, d)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((1, 1, sq, skv)) < 0.3, -np.inf, 0.0), jnp.float32)
    for m in (None, mask):
        ref = np.asarray(attention(q, k, v, h, mask=m, dtype=jnp.float32))
        got = np.asarray(
            attention_qmajor(q, k, v, h, mask=m, dtype=jnp.float32))
        assert np.abs(got - ref).max() < 1e-5


# --------------------------------------------------------- forward shapes ---

def test_unet_forward_shapes_and_spec():
    spec = unet_param_shapes(TINY_UNET)
    params = random_params(spec, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 16, 16, 7))
    ctx = jnp.zeros((2, 12, 16))
    out = unet_forward(params, x, jnp.int32(10), ctx,
                       jnp.zeros((2,), jnp.int32), TINY_UNET, "float32")
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_precomputed_context_kv_exact_and_consumed():
    """The hoisted cross-attention K/V path (precompute_context_kv →
    unet_forward(context_kv=...), the denoise-loop LICM fix — RESULTS.md
    round-4 cross-attention record) is (a) bit-exact vs in-layer
    projections and (b) actually consumed (garbage K/V changes the output
    at every cross-attention layer)."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        crossattn_layer_names, precompute_context_kv)
    spec = unet_param_shapes(TINY_UNET)
    params = random_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 7)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)

    names = crossattn_layer_names(TINY_UNET)
    assert names == ("down_blocks.1.attentions.0", "mid_block.attentions.0",
                     "up_blocks.0.attentions.0", "up_blocks.0.attentions.1")

    base = unet_forward(params, x, jnp.int32(10), ctx, labels, TINY_UNET,
                        "float32")
    kv = precompute_context_kv(params, ctx, TINY_UNET, "float32")
    assert set(kv) == set(names)
    hoisted = unet_forward(params, x, jnp.int32(10), ctx, labels, TINY_UNET,
                           "float32", context_kv=kv)
    np.testing.assert_array_equal(np.asarray(hoisted), np.asarray(base))

    for name in names:
        poisoned = dict(kv)
        k, v = poisoned[name]
        poisoned[name] = (k + 1.0, v)
        out = unet_forward(params, x, jnp.int32(10), ctx, labels, TINY_UNET,
                           "float32", context_kv=poisoned)
        assert np.abs(np.asarray(out) - np.asarray(base)).max() > 0


def test_vae_decode_shapes():
    spec = vae_param_shapes(TINY_VAE, decoder_only=True)
    params = random_params(spec, jax.random.PRNGKey(1))
    lat = jnp.zeros((1, 8, 8, 4))
    out = vae_decode(params, lat, TINY_VAE, "float32")
    assert out.shape == (1, 16, 16, 3)  # one upsample for 2 blocks


def test_clip_forward_shapes():
    spec = clip_param_shapes(TINY_CLIP)
    params = random_params(spec, jax.random.PRNGKey(2))
    ids = jnp.zeros((2, 12), jnp.int32)
    out = clip_text_forward(params, ids, TINY_CLIP, "float32")
    assert out.shape == (2, 12, 16)


# --------------------------------------------- tiny snapshot + pipeline -----

def _save_torch_sd(params: dict, path: str):
    """Convert our JAX-layout params back to a torch state dict file."""
    sd = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if name.endswith(".weight") and a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)
        elif (name.endswith(".weight") and a.ndim == 2
              and not any(m in name for m in ("token_embedding",
                                              "position_embedding",
                                              "class_embedding"))):
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))
    torch.save(sd, path)


@pytest.fixture(scope="module")
def tiny_snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("sd_x4_tiny")
    key = jax.random.PRNGKey(0)

    unet_dir = root / "unet"; unet_dir.mkdir()
    cfg = dict(sample_size=16, in_channels=7, out_channels=4,
               down_block_types=["DownBlock2D", "CrossAttnDownBlock2D"],
               up_block_types=["CrossAttnUpBlock2D", "UpBlock2D"],
               block_out_channels=[8, 16], layers_per_block=1,
               cross_attention_dim=16, attention_head_dim=2,
               num_class_embeds=50, norm_num_groups=4)
    (unet_dir / "config.json").write_text(json.dumps(cfg))
    _save_torch_sd(random_params(unet_param_shapes(UNetConfig(**cfg)), key),
                   str(unet_dir / "diffusion_pytorch_model.bin"))

    vae_dir = root / "vae"; vae_dir.mkdir()
    vcfg = dict(block_out_channels=[8, 16], layers_per_block=1,
                latent_channels=4, norm_num_groups=4, scaling_factor=0.08333,
                in_channels=3, out_channels=3)
    (vae_dir / "config.json").write_text(json.dumps(vcfg))
    _save_torch_sd(random_params(vae_param_shapes(VAEConfig(**vcfg)), key),
                   str(vae_dir / "diffusion_pytorch_model.bin"))

    te_dir = root / "text_encoder"; te_dir.mkdir()
    tcfg = dict(vocab_size=100, hidden_size=16, intermediate_size=32,
                num_hidden_layers=2, num_attention_heads=2,
                max_position_embeddings=12)
    (te_dir / "config.json").write_text(json.dumps(tcfg))
    _save_torch_sd(random_params(clip_param_shapes(CLIPTextConfig(**tcfg)),
                                 key),
                   str(te_dir / "pytorch_model.bin"))

    for sname in ("scheduler", "low_res_scheduler"):
        sdir = root / sname; sdir.mkdir()
        (sdir / "scheduler_config.json").write_text(json.dumps({
            "_class_name": "DDIMScheduler" if sname == "scheduler"
            else "DDPMScheduler",
            "num_train_timesteps": 1000, "beta_start": 0.0001,
            "beta_end": 0.02, "beta_schedule": "scaled_linear",
            "prediction_type": "epsilon"}))
    (root / "model_index.json").write_text(json.dumps(
        {"max_noise_level": 350}))
    return str(root)


def test_pipeline_load_and_upscale(tiny_snapshot):
    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = pipe(prompt="a photo", image=img, noise_level=20,
               num_inference_steps=3, guidance_scale=7.5, seed=0)
    assert out.shape == (16, 16, 3)  # tiny VAE has one x2 upsample
    assert out.dtype == np.uint8
    # DDIM + fixed seed => deterministic
    out2 = pipe(prompt="a photo", image=img, noise_level=20,
                num_inference_steps=3, guidance_scale=7.5, seed=0)
    assert np.array_equal(out, out2)


def test_cfg_split_matches_batched(tiny_snapshot):
    """Split-CFG (two batch-n passes) computes the same per-sample math as
    the batched [uncond, cond] pass; outputs must agree to fusion-level
    float tolerance (uint8: allow off-by-one from rounding)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    outs = {}
    for split in (False, True):
        pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32",
                                     cfg_split=split)
        assert pipe.cfg_split is split
        outs[split] = pipe(prompt="a photo", image=img, noise_level=20,
                           num_inference_steps=3, guidance_scale=7.5, seed=0)
    diff = np.abs(outs[True].astype(np.int16) - outs[False].astype(np.int16))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_split_stage_path_matches_fused(tiny_snapshot):
    """With a StageTimer attached, __call__ runs three jitted programs
    (CLIP encode / denoise loop / VAE decode) instead of the fused single
    program; both paths share _denoise_latents/_decode_latents and the same
    PRNG key, so the pixels must be identical and the timer must carry the
    three diffusion sub-stage rows (the five-config harness's per-stage
    table, VERDICT round 4 #1)."""
    from neural_enhanced_super_resolution_tpu.runtime.profiler import (
        StageTimer)

    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    kw = dict(prompt="a photo", image=img, noise_level=20,
              num_inference_steps=3, guidance_scale=7.5, seed=0)
    fused = pipe(**kw)
    pipe.timer = StageTimer()
    staged = pipe(**kw)
    np.testing.assert_array_equal(fused, staged)
    report = pipe.timer.report()
    assert {"diffusion/clip", "diffusion/denoise",
            "diffusion/vae"} <= set(report)
    assert all(v > 0 for v in report.values())


def test_cfg_sharded_matches_split(tiny_snapshot):
    """Split-CFG sharded over a 2-device ("cfg",) mesh (uncond on device 0,
    cond on device 1, one eps all_gather per step — cfg_shard.py) computes
    the same per-sample math as single-device split-CFG; same tolerance as
    test_cfg_split_matches_batched (VERDICT round 4 #3)."""
    import jax as _jax

    from neural_enhanced_super_resolution_tpu.models.diffusion.cfg_shard import (
        cfg_mesh)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    kw = dict(prompt="a photo", image=img, noise_level=20,
              num_inference_steps=3, guidance_scale=7.5, seed=0)

    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32",
                                 cfg_split=True)
    single = pipe(**kw)
    pipe.cfg_shard_mesh = cfg_mesh(_jax.devices()[:2])
    sharded = pipe(**kw)
    diff = np.abs(sharded.astype(np.int16) - single.astype(np.int16))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_cfg_sharded_with_ddpm_scheduler(tiny_snapshot):
    """The sharded denoise must also carry the DDPM per-step noise path
    (step_noises replicated, noise gated by t>0) identically."""
    import jax as _jax

    from neural_enhanced_super_resolution_tpu.models.diffusion.cfg_shard import (
        cfg_mesh)

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    kw = dict(prompt="a photo", image=img, noise_level=20,
              num_inference_steps=2, guidance_scale=7.5, seed=1)
    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32",
                                 cfg_split=True)
    pipe.scheduler = DDPMScheduler(num_train_timesteps=1000,
                                   beta_start=0.0001, beta_end=0.02,
                                   beta_schedule="scaled_linear")
    single = pipe(**kw)
    pipe.cfg_shard_mesh = cfg_mesh(_jax.devices()[:2])
    sharded = pipe(**kw)
    diff = np.abs(sharded.astype(np.int16) - single.astype(np.int16))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_pipeline_noise_level_guard(tiny_snapshot):
    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32")
    with pytest.raises(ValueError):
        pipe(prompt="x", image=np.zeros((8, 8, 3), np.uint8),
             noise_level=9999)


def test_spec_validation_roundtrip():
    spec = unet_param_shapes(TINY_UNET)
    params = random_params(spec, jax.random.PRNGKey(0))
    missing, unexpected = validate_params(params, spec)
    assert not missing and not unexpected


def test_superres_pipeline_uses_diffusion(tiny_snapshot, tmp_path, test_image):
    """The diffusion branch plugs into the main pipeline end-to-end."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "use_esrgan": False, "segment_enhancement": False,
        "denoise_level": 0, "adaptive_sharpening": False,
        "use_diffusion": True, "diffusion_model_path": tiny_snapshot,
        "num_inference_steps": 2,
        "output_dir": str(tmp_path / "out")})
    out = pipe.enhance_array(test_image[:8, :8])
    assert "diffusion" in pipe.models
    assert out.shape == (16, 16, 3)


def test_ddpm_step_matches_closed_form():
    """One DDPM ancestral step vs. the hand-written posterior formulas."""
    s = DDPMScheduler(num_train_timesteps=50, beta_schedule="linear")
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    t, prev_t = 20, 15
    got = np.asarray(s.step(eps, jnp.int32(t), jnp.int32(prev_t), xt, noise))

    ac = np.asarray(s.alphas_cumprod)
    a_t, a_prev = ac[t], ac[prev_t]
    cur_alpha = a_t / a_prev
    cur_beta = 1 - cur_alpha
    x0 = np.clip((np.asarray(xt) - np.sqrt(1 - a_t) * np.asarray(eps))
                 / np.sqrt(a_t), -1, 1)
    mean = (np.sqrt(a_prev) * cur_beta / (1 - a_t)) * x0 + \
           (np.sqrt(cur_alpha) * (1 - a_prev) / (1 - a_t)) * np.asarray(xt)
    var = (1 - a_prev) / (1 - a_t) * cur_beta
    want = mean + np.sqrt(var) * np.asarray(noise)
    assert np.allclose(got, want, atol=1e-5)


def test_v_prediction_recovers_x0():
    s = DDIMScheduler(num_train_timesteps=100,
                      prediction_type="v_prediction")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
    t = jnp.int32(40)
    xt = s.add_noise(x0, eps, t)
    a = float(s.alphas_cumprod[40])
    v = np.sqrt(a) * np.asarray(eps) - np.sqrt(1 - a) * np.asarray(x0)
    x_prev = s.step(jnp.asarray(v), t, jnp.int32(-1), xt)
    assert np.allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-5)


def test_full_ensemble_esrgan_plus_diffusion(tiny_snapshot, tmp_path,
                                             test_image):
    """Both upscalers active in one iteration: outputs get ensembled
    (the reference's core multi-model value proposition, nesr.py:552-596)."""
    import jax
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, init_rrdbnet)

    arch = dict(num_in_ch=12, num_out_ch=3, scale=4, num_feat=8, num_block=2,
                num_grow_ch=4)
    cfg = RRDBNetConfig(**arch)
    pipe = SuperResolutionPipeline(device="cpu", config={
        "iterations": 1, "segment_enhancement": False, "denoise_level": 0,
        "adaptive_sharpening": False, "use_diffusion": True,
        "diffusion_model_path": tiny_snapshot, "num_inference_steps": 2,
        "esrgan_arch": arch, "output_dir": str(tmp_path / "out")})
    pipe.models["esrgan"] = {
        "params": init_rrdbnet(jax.random.PRNGKey(0), cfg), "cfg": cfg}

    stages = []
    pipe.config["progress_callback"] = lambda s, i, t, m: stages.append(s)
    out = pipe.enhance_array(test_image[:8, :8])
    assert "ESRGAN" in stages and "Diffusion" in stages and "Ensemble" in stages
    # esrgan: 8->32 (x4); tiny-vae diffusion: 8->16; ensemble aligns to the
    # lexicographic max (32, 32) like the reference.
    assert out.shape == (32, 32, 3)


def test_convert_renames_deprecated_attention_keys():
    """Pre-diffusers-0.15 VAE checkpoints use query/key/value/proj_attn
    (ADVICE round 1, medium): both the 2-D linear and 1x1-conv forms must
    land on the to_q/to_k/to_v/to_out.0 names vae.py looks up."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
        convert_state_dict)
    r = np.random.default_rng(0)
    c = 8
    sd = {
        "decoder.mid_block.attentions.0.query.weight":
            r.normal(size=(c, c)).astype(np.float32),
        "decoder.mid_block.attentions.0.query.bias":
            r.normal(size=(c,)).astype(np.float32),
        "decoder.mid_block.attentions.0.key.weight":
            r.normal(size=(c, c, 1, 1)).astype(np.float32),  # 1x1-conv form
        "decoder.mid_block.attentions.0.value.weight":
            r.normal(size=(c, c)).astype(np.float32),
        "decoder.mid_block.attentions.0.proj_attn.weight":
            r.normal(size=(c, c)).astype(np.float32),
        "decoder.mid_block.attentions.0.proj_attn.bias":
            r.normal(size=(c,)).astype(np.float32),
    }
    out = convert_state_dict(sd)
    base = "decoder.mid_block.attentions.0"
    for new in ("to_q.weight", "to_q.bias", "to_k.weight", "to_v.weight",
                "to_out.0.weight", "to_out.0.bias"):
        assert f"{base}.{new}" in out, sorted(out)
    assert not any(".query." in k or ".key." in k or ".value." in k
                   or ".proj_attn." in k for k in out)
    # linear rule applied after rename: weights transposed, conv squeezed
    np.testing.assert_allclose(
        np.asarray(out[f"{base}.to_q.weight"]),
        sd[f"{base}.query.weight"].T)
    np.testing.assert_allclose(
        np.asarray(out[f"{base}.to_k.weight"]),
        sd[f"{base}.key.weight"][:, :, 0, 0].T)


def test_ddim_final_alpha_cumprod_honored():
    """set_alpha_to_one=False (the SD config) must use alphas_cumprod[0] as
    the below-zero previous alpha-bar (ADVICE round 1)."""
    from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
        DDIMScheduler)
    import jax.numpy as jnp
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(r.normal(size=x.shape).astype(np.float32))
    s_one = DDIMScheduler(set_alpha_to_one=True)
    s_sd = DDIMScheduler(set_alpha_to_one=False)
    assert float(s_one.final_alpha_cumprod) == 1.0
    assert float(s_sd.final_alpha_cumprod) == float(s_sd.alphas_cumprod[0])
    # last step (prev_t < 0) must differ between the two configurations
    t = jnp.asarray(0)
    prev_t = jnp.asarray(-100)
    out_one = s_one.step(eps, t, prev_t, x)
    out_sd = s_sd.step(eps, t, prev_t, x)
    assert not np.allclose(np.asarray(out_one), np.asarray(out_sd))


def test_scheduler_clip_sample_config():
    from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
        DDIMScheduler, DDPMScheduler)
    assert DDPMScheduler().clip_sample is True
    assert DDIMScheduler().clip_sample is False  # SD DDIM configs
    assert DDIMScheduler(clip_sample=True).clip_sample is True
    assert DDPMScheduler(clip_sample=False).clip_sample is False


def _toy_clip_vocab(tmp_path):
    """A small-but-real CLIP-style vocab/merges pair on disk, loadable by
    BOTH transformers.CLIPTokenizer and our native BPE."""
    import json

    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + \
            [str(d) for d in range(10)] + list(".,!?'-&@#")
    vocab = {}
    for ch in chars:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    merges = []
    for pair in [("t", "h"), ("th", "e</w>"), ("i", "n"), ("in", "g</w>"),
                 ("a", "n"), ("an", "d</w>"), ("e", "r</w>"), ("o", "n"),
                 ("c", "a"), ("ca", "t</w>"), ("'", "s</w>"), ("1", "9"),
                 ("o", "o"), ("oo", "l</w>"), ("e", "n"), ("en", "h"),
                 ("enh", "an"), ("r", "e"), ("s", "t"), ("st", "o")]:
        merges.append(pair)
        vocab["".join(pair)] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    d = tmp_path / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return str(d)


def test_native_clip_bpe_matches_transformers(tmp_path):
    """Token ids from the native BPE == transformers.CLIPTokenizer on a
    mixed-case/punctuation corpus over the same vocab files (VERDICT #5)."""
    transformers = pytest.importorskip("transformers")

    from neural_enhanced_super_resolution_tpu.models.diffusion.tokenizer import (
        ClipBpeTokenizer)

    tok_dir = _toy_clip_vocab(tmp_path)
    ours = ClipBpeTokenizer.from_pretrained(tok_dir)
    theirs = transformers.CLIPTokenizer.from_pretrained(tok_dir)
    corpus = [
        "The cat's enhancing!",
        "  COOL, 1999 things -- and then...  ",
        "store@19 #cats, it's ok?!",
        "a",
        "",
        "the THE tHe",
    ]
    for text in corpus:
        a = ours(text, padding="max_length", max_length=32,
                 truncation=True, return_tensors="np").input_ids
        b = theirs(text, padding="max_length", max_length=32,
                   truncation=True, return_tensors="np",
                   pad_to_multiple_of=None).input_ids
        assert a.tolist() == b.tolist(), (text, a.tolist(), b.tolist())


def test_native_clip_bpe_loads_in_pipeline(tmp_path, tiny_snapshot):
    """load_pipeline picks up the native tokenizer when files exist."""
    import shutil

    from neural_enhanced_super_resolution_tpu.models.diffusion.pipeline import (
        load_upscale_pipeline)
    from neural_enhanced_super_resolution_tpu.models.diffusion.tokenizer import (
        ClipBpeTokenizer)

    tok_dir = _toy_clip_vocab(tmp_path)
    shutil.copytree(tok_dir, os.path.join(tiny_snapshot, "tokenizer"),
                    dirs_exist_ok=True)
    pipe = load_upscale_pipeline(tiny_snapshot, compute_dtype="float32")
    assert isinstance(pipe.tokenizer, ClipBpeTokenizer)
    ids = pipe._tokenize("a cat")
    assert ids.shape[1] == pipe.text_cfg.max_position_embeddings


# ------------------------------------------------ full-model torch parity ---

def _twin_models(seed=0):
    """Tiny UNet+VAE: one diffusers-format torch state dict each, plus the
    converted JAX params (convert_state_dict) and configs."""
    import torch as _torch

    from neural_enhanced_super_resolution_tpu.models.diffusion.convert import (
        convert_state_dict)
    from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
        unet_param_shapes, vae_param_shapes)
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        UNetConfig)
    from neural_enhanced_super_resolution_tpu.models.diffusion.vae import (
        VAEConfig)

    ucfg = UNetConfig(sample_size=8, in_channels=7, out_channels=4,
                      block_out_channels=(8, 16), layers_per_block=1,
                      down_block_types=("DownBlock2D",
                                        "CrossAttnDownBlock2D"),
                      up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
                      cross_attention_dim=16, attention_head_dim=2,
                      num_class_embeds=25, norm_num_groups=4)
    vcfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     norm_num_groups=4, scaling_factor=0.08333)
    rng = np.random.default_rng(seed)

    def torch_sd(spec):
        sd = {}
        for name, shape in spec.items():
            arr = rng.normal(0, 0.2, shape).astype(np.float32)
            # our spec layouts -> torch layouts
            if name.endswith(".weight") and len(shape) == 4:
                arr = arr.transpose(3, 2, 0, 1)        # HWIO -> OIHW
            elif (name.endswith(".weight") and len(shape) == 2
                  and "embedding.weight" not in name
                  and not name.startswith("class_embedding")):
                arr = arr.T                            # (in,out) -> (out,in)
            sd[name] = _torch.from_numpy(np.ascontiguousarray(arr))
        return sd

    unet_sd = torch_sd(unet_param_shapes(ucfg))
    vae_sd = torch_sd(vae_param_shapes(vcfg, decoder_only=True))
    unet_params = convert_state_dict(
        {k: v.numpy() for k, v in unet_sd.items()})
    vae_params = convert_state_dict(
        {k: v.numpy() for k, v in vae_sd.items()})
    return ucfg, vcfg, unet_sd, vae_sd, unet_params, vae_params


def test_unet_full_forward_matches_torch_twin():
    """Whole-UNet forward parity vs an independent torch implementation fed
    the same diffusers-format state dict (VERDICT #4)."""
    import torch as _torch

    from tests.torch_twin import torch_unet_forward
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        unet_forward)

    ucfg, _, unet_sd, _, unet_params, _ = _twin_models()
    rng = np.random.default_rng(3)
    sample = rng.normal(0, 1, (2, 8, 8, 7)).astype(np.float32)
    ctx = rng.normal(0, 1, (2, 5, 16)).astype(np.float32)
    labels = np.asarray([3, 7])
    ours = np.asarray(unet_forward(
        unet_params, jnp.asarray(sample), jnp.asarray(40),
        jnp.asarray(ctx), jnp.asarray(labels), ucfg, "float32"))
    with _torch.no_grad():
        ref = torch_unet_forward(
            unet_sd, _torch.from_numpy(sample.transpose(0, 3, 1, 2)),
            40, _torch.from_numpy(ctx), _torch.from_numpy(labels), ucfg)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


def test_vae_decode_matches_torch_twin():
    import torch as _torch

    from tests.torch_twin import torch_vae_decode
    from neural_enhanced_super_resolution_tpu.models.diffusion.vae import (
        vae_decode)

    _, vcfg, _, vae_sd, _, vae_params = _twin_models()
    rng = np.random.default_rng(4)
    lat = rng.normal(0, 1, (1, 6, 6, 4)).astype(np.float32)
    ours = np.asarray(vae_decode(vae_params, jnp.asarray(lat), vcfg,
                                 "float32"))
    with _torch.no_grad():
        ref = torch_vae_decode(
            vae_sd, _torch.from_numpy(lat.transpose(0, 3, 1, 2)), vcfg)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


@pytest.mark.parametrize("kind", ["ddim", "ddpm"])
@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_per_step_latent_traces(kind, pred):
    """10-step CFG denoise loop: per-step latents match the torch twin with
    independently implemented scheduler math (SURVEY §7 'Diffusion numerical
    parity'; VERDICT #4). Same fixed noises on both sides."""
    import torch as _torch

    from tests.torch_twin import TorchScheduler, torch_unet_forward
    from neural_enhanced_super_resolution_tpu.models.diffusion.scheduler import (
        DDIMScheduler, DDPMScheduler)
    from neural_enhanced_super_resolution_tpu.models.diffusion.unet import (
        unet_forward)

    ucfg, _, unet_sd, _, unet_params, _ = _twin_models()
    rng = np.random.default_rng(5)
    steps = 10
    guidance = 7.5
    noise_level = 20
    h = w = 8

    img = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    img_noise = rng.normal(0, 1, img.shape).astype(np.float32)
    lat0 = rng.normal(0, 1, (1, h, w, 4)).astype(np.float32)
    step_noise = rng.normal(0, 1, (steps, 1, h, w, 4)).astype(np.float32)
    ctx = rng.normal(0, 1, (2, 5, 16)).astype(np.float32)  # [uncond, cond]

    # ours
    sk = dict(prediction_type=pred, set_alpha_to_one=False)
    ours_sched = (DDIMScheduler(**sk) if kind == "ddim"
                  else DDPMScheduler(**sk))
    low = DDPMScheduler()
    noisy = np.asarray(low.add_noise(jnp.asarray(img),
                                     jnp.asarray(img_noise),
                                     jnp.asarray(noise_level)))
    ts = ours_sched.timesteps(steps)

    # torch twin
    twin = TorchScheduler(kind, prediction_type=pred, set_alpha_to_one=False)
    twin_low = TorchScheduler("ddpm")
    noisy_t = twin_low.add_noise(img, img_noise, noise_level)
    np.testing.assert_allclose(noisy, noisy_t, atol=1e-5)

    lat_ours = jnp.asarray(lat0)
    lat_twin = lat0.copy()
    img2 = np.concatenate([noisy, noisy], axis=0)
    nl2 = np.asarray([noise_level, noise_level])
    for i, t in enumerate(ts):
        prev_t = int(ts[i + 1]) if i + 1 < steps else -1
        # ours
        lat2 = jnp.concatenate([lat_ours, lat_ours], axis=0)
        unet_in = jnp.concatenate([lat2, jnp.asarray(img2)], axis=-1)
        out = unet_forward(unet_params, unet_in, jnp.asarray(int(t)),
                           jnp.asarray(ctx), jnp.asarray(nl2), ucfg,
                           "float32")
        u, c = np.split(np.asarray(out), 2, axis=0)
        guided = u + guidance * (c - u)
        if kind == "ddpm":
            nz = step_noise[i] if t > 0 else np.zeros_like(step_noise[i])
            lat_ours = ours_sched.step(jnp.asarray(guided), jnp.asarray(int(t)),
                                       jnp.asarray(prev_t), lat_ours,
                                       jnp.asarray(nz))
        else:
            lat_ours = ours_sched.step(jnp.asarray(guided),
                                       jnp.asarray(int(t)),
                                       jnp.asarray(prev_t), lat_ours)

        # twin
        with _torch.no_grad():
            lat2_t = np.concatenate([lat_twin, lat_twin], axis=0)
            unet_in_t = np.concatenate([lat2_t, img2], axis=-1)
            out_t = torch_unet_forward(
                unet_sd,
                _torch.from_numpy(unet_in_t.transpose(0, 3, 1, 2)),
                int(t), _torch.from_numpy(ctx), _torch.from_numpy(nl2), ucfg)
        out_t = out_t.numpy().transpose(0, 2, 3, 1)
        ut, ct = np.split(out_t, 2, axis=0)
        guided_t = ut + guidance * (ct - ut)
        lat_twin = twin.step(guided_t, int(t), prev_t, lat_twin,
                             noise=step_noise[i])

        err = np.abs(np.asarray(lat_ours) - lat_twin).max()
        scale = max(np.abs(lat_twin).max(), 1.0)
        assert err / scale < 5e-4, (kind, pred, i, err, scale)
