"""Record/replay round trips for tools/compare_reference.py (VERDICT round 2
#5: the parity harness must cover the diffusion and SegFormer stacks, with
the --check path exercised in CI on a tiny recorded fixture).

segformer: record mode runs REAL HuggingFace transformers inference (torch)
on a tiny random-weight snapshot and records logits; check mode replays the
recorded net inputs through our JAX SegFormer — a genuine two-implementation
round trip through the tool's npz schema.

diffusion: the golden is produced by the independent torch twin
(tests/torch_twin.py: published UNet/VAE/DDIM math, no diffusers needed)
driving the exact explicit loop record_diffusion runs on a reference
machine; check mode replays it via UpscalePipeline.trace_latents with the
recorded noise tensors.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))  # tests.torch_twin

_SPEC = importlib.util.spec_from_file_location(
    "compare_reference",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "compare_reference.py"))
cr = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cr)


def _args(**kw):
    base = dict(record=None, check=None, stack="esrgan", weights=None,
                images=[], crop=512, tolerance=0.1, seg_agreement=0.999,
                lat_tolerance=0.05, steps=20,
                prompt="a high resolution, detailed photograph")
    base.update(kw)
    return argparse.Namespace(**base)


# ----------------------------------------------------------- segformer -----

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def segformer_snapshot(tmp_path_factory):
    cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[1, 1, 1, 1],
        sr_ratios=[4, 2, 2, 1], hidden_sizes=[8, 16, 16, 32],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 2, 4], mlp_ratios=[2, 2, 2, 2],
        decoder_hidden_size=16, num_labels=10)
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(cfg).eval()
    snap = tmp_path_factory.mktemp("segformer_snap")
    model.save_pretrained(str(snap), safe_serialization=True)
    return str(snap)


def test_segformer_record_replay_roundtrip(segformer_snapshot, tmp_path,
                                           test_image):
    from neural_enhanced_super_resolution_tpu.utils.io import imwrite_rgb

    img_path = str(tmp_path / "in.png")
    imwrite_rgb(img_path, test_image[:96, :96])
    npz = str(tmp_path / "seg_goldens.npz")

    rc = cr.record_segformer(_args(record=npz, weights=segformer_snapshot,
                                   images=[img_path], stack="segformer"))
    assert rc == 0 and os.path.exists(npz)
    data = np.load(npz)
    assert str(data["stack"]) == "segformer"
    assert data["logits_0"].ndim == 3  # (H/4, W/4, num_labels)

    # f32 on both sides: random-weight logits can have tight top-2 gaps, so
    # CI uses a slightly looser agreement threshold than production's 0.999.
    rc = cr.check_segformer(_args(check=npz, weights=segformer_snapshot,
                                  stack="segformer", seg_agreement=0.98))
    assert rc == 0


# ----------------------------------------------------------- diffusion -----

@pytest.fixture(scope="module")
def diffusion_snapshot(tmp_path_factory):
    """Tiny diffusers-layout snapshot (same shape as test_diffusion's)."""
    import jax

    from neural_enhanced_super_resolution_tpu.models.diffusion import (
        CLIPTextConfig, UNetConfig, VAEConfig)
    from neural_enhanced_super_resolution_tpu.models.diffusion.specs import (
        clip_param_shapes, random_params, unet_param_shapes,
        vae_param_shapes)

    root = tmp_path_factory.mktemp("sd_snap")
    key = jax.random.PRNGKey(0)

    def save_sd(params, path):
        """Our JAX-layout params -> torch state-dict file (same conversion
        as tests/test_diffusion._save_torch_sd)."""
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

    ucfg_d = dict(sample_size=8, in_channels=7, out_channels=4,
                  down_block_types=["DownBlock2D", "CrossAttnDownBlock2D"],
                  up_block_types=["CrossAttnUpBlock2D", "UpBlock2D"],
                  block_out_channels=[8, 16], layers_per_block=1,
                  cross_attention_dim=16, attention_head_dim=2,
                  num_class_embeds=350, norm_num_groups=4)
    d = root / "unet"; d.mkdir()
    (d / "config.json").write_text(json.dumps(ucfg_d))
    save_sd(random_params(unet_param_shapes(UNetConfig(**ucfg_d)), key,
                          scale=0.05),
            str(d / "diffusion_pytorch_model.bin"))

    vcfg_d = dict(block_out_channels=[8, 16], layers_per_block=1,
                  latent_channels=4, norm_num_groups=4,
                  scaling_factor=0.08333, in_channels=3, out_channels=3)
    d = root / "vae"; d.mkdir()
    (d / "config.json").write_text(json.dumps(vcfg_d))
    save_sd(random_params(vae_param_shapes(VAEConfig(**vcfg_d)), key,
                          scale=0.05),
            str(d / "diffusion_pytorch_model.bin"))

    tcfg_d = dict(vocab_size=100, hidden_size=16, intermediate_size=32,
                  num_hidden_layers=2, num_attention_heads=2,
                  max_position_embeddings=12)
    d = root / "text_encoder"; d.mkdir()
    (d / "config.json").write_text(json.dumps(tcfg_d))
    save_sd(random_params(clip_param_shapes(CLIPTextConfig(**tcfg_d)), key,
                          scale=0.05),
            str(d / "pytorch_model.bin"))

    for sname, cls in (("scheduler", "DDIMScheduler"),
                       ("low_res_scheduler", "DDPMScheduler")):
        d = root / sname; d.mkdir()
        (d / "scheduler_config.json").write_text(json.dumps({
            "_class_name": cls, "num_train_timesteps": 1000,
            "beta_start": 0.0001, "beta_end": 0.02,
            "beta_schedule": "scaled_linear",
            "prediction_type": "epsilon"}))
    (root / "model_index.json").write_text(json.dumps(
        {"max_noise_level": 350}))
    return str(root)


def test_diffusion_record_replay_roundtrip(diffusion_snapshot, tmp_path):
    """Golden from the independent torch twin -> check_diffusion replay."""
    from tests.torch_twin import (TorchScheduler, torch_unet_forward,
                                  torch_vae_decode)
    from neural_enhanced_super_resolution_tpu.models.diffusion import (
        load_upscale_pipeline)

    pipe = load_upscale_pipeline(diffusion_snapshot, compute_dtype="float32")
    prompt = "a photo of a cat"
    steps, nl, gs = 4, 20, 7.5
    rng = np.random.default_rng(7)
    img_u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    image_noise = rng.standard_normal((8, 8, 3)).astype(np.float32)
    init_latents = rng.standard_normal((8, 8, 4)).astype(np.float32)

    # Text embeddings from OUR encoder (CLIP parity is tested separately;
    # the trajectory under test is UNet + scheduler + VAE).
    embeds = np.asarray(pipe.encode_prompt(prompt))  # (2, L, hidden)

    twin = TorchScheduler("ddim")              # matches snapshot defaults
    twin_low = TorchScheduler("ddpm")
    img_f = img_u8[None].astype(np.float32) / 127.5 - 1.0       # NHWC
    noisy = twin_low.add_noise(img_f, image_noise[None], nl)
    img2 = np.concatenate([noisy, noisy], axis=0)
    nl2 = np.asarray([nl, nl])

    ts = twin.timesteps(steps)
    lat = init_latents[None].copy()
    lats = []
    for i, t in enumerate(ts):
        prev_t = int(ts[i + 1]) if i + 1 < steps else -1
        lat2 = np.concatenate([lat, lat], axis=0)
        unet_in = np.concatenate([lat2, img2], axis=-1)
        with torch.no_grad():
            out = torch_unet_forward(
                pipe_unet_sd(diffusion_snapshot),
                torch.from_numpy(unet_in.transpose(0, 3, 1, 2)), int(t),
                torch.from_numpy(embeds), torch.from_numpy(nl2),
                pipe.unet_cfg)
        out = out.numpy().transpose(0, 2, 3, 1)
        u, c = np.split(out, 2, axis=0)
        lat = twin.step(u + gs * (c - u), int(t), prev_t, lat)
        lats.append(lat[0])
    with torch.no_grad():
        dec = torch_vae_decode(
            pipe_vae_sd(diffusion_snapshot),
            torch.from_numpy(
                (lat / pipe.vae_cfg.scaling_factor).transpose(0, 3, 1, 2)),
            pipe.vae_cfg)
    final = (dec[0].numpy().transpose(1, 2, 0) + 1) * 127.5
    final = np.clip(final, 0, 255).round().astype(np.uint8)

    npz = str(tmp_path / "diff_goldens.npz")
    np.savez_compressed(
        npz, stack="diffusion", prompt=np.array(prompt), image=img_u8,
        steps=steps, noise_level=nl, guidance=gs, image_noise=image_noise,
        init_latents=init_latents, timesteps=ts.astype(np.int64),
        latents=np.stack(lats), final=final)

    rc = cr.check_diffusion(_args(check=npz, weights=diffusion_snapshot,
                                  stack="diffusion", lat_tolerance=5e-3))
    assert rc == 0


def pipe_unet_sd(snapshot):
    sd = torch.load(os.path.join(snapshot, "unet",
                                 "diffusion_pytorch_model.bin"),
                    map_location="cpu", weights_only=True)
    return sd


def pipe_vae_sd(snapshot):
    return torch.load(os.path.join(snapshot, "vae",
                                   "diffusion_pytorch_model.bin"),
                      map_location="cpu", weights_only=True)


def test_parity_runbook_commands_parse():
    """VERDICT round 4 #9: the real-weights parity runbook in
    docs/usage_guide.md must stay executable — every command in its code
    block parses against the actual CLI surfaces (compare_reference
    argparse, downloader registry keys, nesr CLI flags), so the first
    network-attached session can close the 0.1 dB claim by copy-paste."""
    import re
    import shlex

    guide = open(os.path.join(os.path.dirname(__file__), "..", "docs",
                              "usage_guide.md")).read()
    section = guide.split("## Real-weights parity runbook")[1]
    block = re.search(r"```bash\n(.*?)```", section, re.S).group(1)
    # join "\"-continued lines, drop comments/blank lines
    script = re.sub(r"\\\n\s*", " ", block)
    cmds = [ln.strip() for ln in script.splitlines()
            if ln.strip() and not ln.strip().startswith("#")]
    assert len(cmds) >= 8  # 2 download + 3 record + 3 check

    from neural_enhanced_super_resolution_tpu.utils.downloader import MODELS
    from neural_enhanced_super_resolution_tpu.cli import parse_arguments

    seen = {"compare": 0, "downloader": 0, "nesr": 0}
    for cmd in cmds:
        argv = shlex.split(cmd)
        if "tools/compare_reference.py" in argv[1]:
            args = cr.build_parser().parse_args(argv[2:])
            assert args.record or args.check
            if args.record:
                assert args.images  # main() errors on --record w/o images
            seen["compare"] += 1
        elif "downloader" in cmd:
            keys = argv[argv.index("--models") + 1:]
            assert keys and all(k in MODELS for k in keys), keys
            seen["downloader"] += 1
        elif "-m nesr" in cmd:
            args = parse_arguments(argv[3:])
            assert args.download_models
            seen["nesr"] += 1
    assert seen == {"compare": 6, "downloader": 1, "nesr": 1}
