"""Pipeline configuration: reference-compatible keys + TPU-specific extras.

Defaults replicate /root/reference/nesr/nesr.py:33-65 exactly (same keys, same
values) so JSON configs written for the reference work unchanged. The
device_specific overlay reproduces :72-77 — including honouring user overrides
— but fixes the reference's latent crash when config is None (:76 evaluates
``key not in config`` on None; SURVEY.md §7 "Reference bugs").

TPU-only keys (all prefixed or additive, never colliding with reference keys):
    precision            'bfloat16' | 'float32' compute dtype for models
    parity_tiling        True -> reference-exact tile stitch arithmetic
    tile_batch           max tiles per model invocation (HBM bound)
    esrgan_model_path    explicit checkpoint path override
    esrgan_arch          dict overriding RRDBNet hyperparams (tests use this)
"""

from __future__ import annotations

import copy
from typing import Any

__all__ = ["default_config", "merge_config"]


def default_config() -> dict[str, Any]:
    return {
        "iterations": 3,
        "use_diffusion": True,
        "use_esrgan": True,
        "use_swinir": False,  # documented-but-unimplemented in the reference
        "preserve_details": True,
        "adaptive_sharpening": True,
        "segment_enhancement": True,
        "denoise_level": 0.5,
        "upscale_factor": 2,
        "intermediate_saves": False,
        "output_dir": "outputs",
        "progress_callback": None,
        "image_callback": None,
        # Memory management options (reference nesr.py:47-51)
        "force_3channel": False,
        "max_tile_size": 512,
        "enable_tiling": True,
        "memory_efficient": False,
        "device_specific": {
            "tpu": {
                # Tile above 8 MP (cuda-reference-like semantics: the tiled canvas is
                # scaled by upscale_factor, untiled keeps the raw model scale). Below
                # the threshold, _esrgan_whole still COMPUTES via fixed tiles (one
                # compiled program for all sizes) without the canvas shrink.
                "max_megapixels": 8,
                # 256-px tiles at batch 16 are the measured v5e conv sweet
                # spot (benchmarks/RESULTS.md: tile 512 runs 30% slower and
                # its batch-16 program over-allocates HBM).
                "max_tile_size": 256,
                # The reference's call sites run padding=16 (nesr.py:807);
                # halo is quality-indistinguishable in [6, 16] with TRAINED
                # weights (tests/test_quality.py halo parametrisation) and
                # the round-4 same-session A/B measured halo 6 at 18.41
                # MP_out/s vs halo 10's 16.91 (+8.8%), so the TPU
                # production default is 6. Set tile_halo=16 explicitly for
                # reference-exact geometry (e.g. with parity_tiling).
                "tile_halo": 6,
                "half_precision": True,    # bf16 on TPU
                # Backend-level rung failures retry on the host CPU backend
                # before the bicubic floor (the reference's MPS fallback
                # semantics, nesr.py:951-983, completed for TPU —
                # pipeline._esrgan_cpu_rung).
                "fallback_to_cpu": True,
                # ONE tile executable for every image size: partial chunks
                # pad to the full tile_batch instead of power-of-two
                # buckets. Each extra big executable costs seconds of
                # first-execution load per process on remote/tunnel hosts
                # (RESULTS.md round-4 warm-serving study); the padded
                # tiles' compute is far cheaper.
                "tile_tail": "full",
                # Dispatch a throwaway tile batch right after weight load so
                # the hot executable's deserialize/upload overlaps the
                # host-side preprocess of the first iteration.
                "prewarm": True,
                # Deterministic analog of the reference's diffusion OOM-skip
                # (see the diffusion_max_megapixels comment below): just
                # above 512x512 input, the published x4-upscaler's intended
                # scale. Set None to run diffusion at any size.
                "diffusion_max_megapixels": 0.27,
            },
            "cpu": {
                "max_megapixels": 2,       # reference cpu threshold
            },
            # Reference platforms kept for config compatibility; their values
            # apply if a config explicitly routes through them.
            "mps": {"force_3channel": True, "max_megapixels": 4,
                    "fallback_to_cpu": True},
            "cuda": {"half_precision": True},
        },
        # --- TPU-native extras ---
        "precision": None,            # None -> per-device default
        "parity_tiling": False,
        # Stage-level PP: leave ESRGAN's dispatch in flight while the
        # diffusion branch runs (disjoint device subsets on a mesh —
        # parallel/overlap.py; SURVEY.md §2c PP row).
        "stage_overlap": True,
        # Multi-device execution from the product entry points: "auto"
        # shards the ESRGAN tile batch over every visible device (and, with
        # use_diffusion + stage_overlap, splits the device list so the
        # denoise loop runs concurrently on its own chips —
        # pipeline._parallel_layout). "off" forces single-device; an int
        # caps the device count. Single-chip hosts are unaffected.
        "data_parallel": "auto",
        # Multi-chip sharding strategy for the upscale branches:
        # "tiles" (default) = tile-batch DP; "strips" = strip-shard the
        # image with ICI ppermute halo exchange (SP/CP, parallel/sharded);
        # "auto" = strips above the reference's 16 MP force-tiling
        # threshold, tiles otherwise. Single-chip hosts ignore this.
        "shard_strategy": "tiles",
        # 16 tiles per device batch: the measured v5e sweet spot, and an HBM
        # guard (None = all tiles at once OOMs on 4K+ images).
        "tile_batch": 16,
        "tile_halo": 16,              # overlap halo px (reference pad=16)
        "esrgan_model_path": None,
        "esrgan_arch": None,
        # use_swinir is a REAL branch here (models/swinir.py), not the
        # reference's unimplemented placeholder. Off by default to match
        # the reference's default config (nesr.py:37).
        "swinir_model_path": None,
        # SwinIR tiles at batch 1: its HBM-bound attention glue scales
        # with batch (measured 6.89/6.55/6.17 MP_out/s at b=1/2/4 on
        # 288-px tiles, benchmarks/swinir_batch_sweep.py) — the trunk's
        # tile_batch=16 would cost the branch ~15-25%.
        "swinir_tile_batch": 1,
        "diffusion_model_path": None,
        "segmentation_model_path": None,
        # Partial tile chunks: "bucket" (power-of-two, cheapest compute)
        # or "full" (pad to tile_batch — one executable for all sizes;
        # the TPU overlay selects this).
        "tile_tail": "bucket",
        "prewarm": False,
        # Final-iteration fusion: when ESRGAN is the only upscale branch,
        # run ESRGAN + adaptive sharpen per tile and STREAM output tiles to
        # the host while later chunks compute (hides the D2H of the full
        # result under compute — parallel/tiling.process_tiled_to_host).
        "streamed_output": True,
        # Resolution cap (MP) for the NL-means denoise stage — the denoise
        # analog of the reference's <=1024px segmentation cap (nesr.py:704-709).
        # None = always full-res (reference semantics). See
        # ops/enhance.denoise_stage for the residual-transfer scheme.
        "denoise_max_megapixels": None,
        # Input-size cap (MP) for the diffusion branch. The reference has no
        # explicit cap: on its CUDA/MPS targets the x4 upscaler's
        # full-latent-resolution attention OOMs above roughly 512^2 inputs
        # and the branch is skipped via the exception ladder
        # (nesr.py:1028-1031 "Diffusion-based upscaling failed"). On TPU the
        # flash-attention kernel removes the OOM, so an uncapped iteration-2
        # input (the canvas grows 4x per iteration once the diffusion branch
        # joins the ensemble) would instead run O(tokens^2) attention for
        # minutes-to-hours. This key makes the skip deterministic and logged
        # instead of OOM-driven; None = no cap (reference semantics). The
        # TPU overlay sets 0.27 (just above 512x512 = 0.262 MP, the
        # published checkpoint's intended input scale). Measured growth
        # curve: benchmarks/envelope_sd_latent_growth.py.
        "diffusion_max_megapixels": None,
        # Split the diffusion call into three timed programs (CLIP encode /
        # denoise loop / VAE decode -> diffusion/clip|denoise|vae stage rows)
        # instead of the fused single program. Identical outputs (shared
        # body helpers, equality-tested); costs one extra latents
        # materialisation + two dispatches. NESR_SD_STAGE_DETAIL=1 also
        # enables it. Used by benchmarks/run_all.py's per-stage table.
        "sd_stage_detail": False,
        "num_inference_steps": None,  # None -> per-device default (10/20)
        # Classifier-free guidance as two batch-n UNet passes instead of
        # one batch-2n pass. None -> on (NESR_SD_CFG_SPLIT=0 disables).
        # Identical per-sample math; measured ~16% faster per denoise step
        # on v5e at 128^2 latents, where the batched step is super-linear
        # in batch (benchmarks/envelope_unet_batch.py).
        "sd_cfg_split": None,
        # Shard the two split-CFG UNet passes over TWO devices (a ("cfg",)
        # mesh, models/diffusion/cfg_shard.py): uncond on chip 0, cond on
        # chip 1, one small eps all_gather per step. Engages only when >=2
        # devices are visible; equality with single-device split-CFG pinned
        # by test_cfg_sharded_matches_split; the CFG-doubling share it
        # attacks is 0.39 of the UNet step (RESULTS.md round-4
        # decomposition). Off by default pending multi-chip hardware to
        # measure the win on.
        "sd_cfg_shard": False,
    }


def merge_config(device: str, user_config: dict | None) -> dict[str, Any]:
    """defaults <- user config <- device-specific overlay (user keys win)."""
    cfg = default_config()
    user_config = user_config or {}
    cfg.update(user_config)
    overlay = cfg["device_specific"].get(device, {})
    for key, value in overlay.items():
        if key not in user_config:  # only fill keys the user didn't set
            cfg[key] = value
    return cfg


def snapshot(cfg: dict[str, Any]) -> dict[str, Any]:
    """Deep copy minus unpicklable callbacks (for logging/debugging)."""
    out = {k: v for k, v in cfg.items()
           if k not in ("progress_callback", "image_callback")}
    return copy.deepcopy(out)
