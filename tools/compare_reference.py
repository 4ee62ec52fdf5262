#!/usr/bin/env python3
"""Reference-parity quality harness: PSNR of this framework vs the PyTorch
reference stack on identical inputs (BASELINE.md: "PSNR within 0.1 dB").

This environment is zero-egress (no published weights, no basicsr/diffusers),
so the harness is designed to run WHERE THE REFERENCE STACK EXISTS and to be
verifiable HERE through recorded goldens:

  mode A (reference machine):  --record goldens.npz
      Runs the PyTorch reference's ESRGAN forward (basicsr RRDBNet loaded
      exactly as /root/reference/nesr/nesr.py:216 does, 12-channel stack from
      nesr.py:860-879) on degraded crops of the input images and records
      inputs + outputs + per-image PSNR vs the clean originals.

  mode B (this framework, anywhere):  --check goldens.npz
      Replays the recorded inputs through our RRDBNet with the same
      checkpoint, compares outputs (max|diff|, PSNR-vs-original delta) and
      prints the parity table. Exit code 1 if any |dPSNR| > --tolerance
      (default 0.1 dB).

Degradation follows the reference's own testing workflow (SURVEY §4:
downscale + noise + JPEG via nesr/utils/image_utils.py semantics), applied
with OUR utils so mode A only needs torch+basicsr+cv2.

Usage:
    # on a machine with basicsr + the published RealESRGAN_x2plus.pth:
    python tools/compare_reference.py --record goldens.npz \
        --weights RealESRGAN_x2plus.pth --images img1.png img2.png

    # here (or anywhere with this framework):
    python tools/compare_reference.py --check goldens.npz \
        --weights RealESRGAN_x2plus.pth
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def degrade(img: np.ndarray, seed: int = 0) -> np.ndarray:
    """The reference's de-facto test degradation (SURVEY §4): 0.5x bicubic
    downscale + gaussian noise + JPEG 75, via our image_utils."""
    from neural_enhanced_super_resolution_tpu.utils.image_utils import (
        add_noise, apply_jpeg_compression, downsample_image)

    out = downsample_image(img, 0.5, interpolation="bicubic")
    out = add_noise(out, "gaussian", amount=0.02,
                    rng=np.random.default_rng(seed))
    return apply_jpeg_compression(out, quality=75)


# Architecture of the published checkpoint; tests override with tiny nets.
ARCH = dict(num_feat=64, num_block=23, num_grow_ch=32)


def stack12(img_bgr: np.ndarray) -> np.ndarray:
    """The reference's 12-channel input builder (nesr.py:860-879):
    [original, x1.1, x0.9, blur3] stacked on channels, float [0,1]."""
    import cv2  # mode A only

    f = img_bgr.astype(np.float32) / 255.0
    bright = np.clip(f * 1.1, 0, 1)
    dark = np.clip(f * 0.9, 0, 1)
    blur = cv2.GaussianBlur(f, (3, 3), 0)
    return np.concatenate([f, bright, dark, blur], axis=2)


def run_reference(weights: str, inp_rgb: np.ndarray) -> np.ndarray:
    """Reference ESRGAN forward (requires torch + basicsr)."""
    import torch
    from basicsr.archs.rrdbnet_arch import RRDBNet

    model = RRDBNet(num_in_ch=12, num_out_ch=3, scale=4, **ARCH)
    sd = torch.load(weights, map_location="cpu")
    model.load_state_dict(sd.get("params_ema", sd.get("params", sd)),
                          strict=True)
    model.eval()
    bgr = inp_rgb[:, :, ::-1]
    x = torch.from_numpy(stack12(bgr).transpose(2, 0, 1))[None]
    with torch.no_grad():
        y = model(x)[0].numpy().transpose(1, 2, 0)
    y = np.clip(y, 0, 1)[:, :, ::-1]  # BGR -> RGB
    return (y * 255.0).round().astype(np.uint8)


def run_ours(weights: str, inp_rgb: np.ndarray) -> np.ndarray:
    """Our RRDBNet forward through the production path (bf16 on TPU,
    f32 elsewhere), same 12-channel semantics (pipeline._esrgan_jit)."""
    import jax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params)
    from neural_enhanced_super_resolution_tpu.models.weights import (
        load_state_dict, rrdbnet_params_from_state_dict)
    from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, **ARCH)
    params = fuse_rrdbnet_params(
        rrdbnet_params_from_state_dict(load_state_dict(weights),
                                       num_block=cfg.num_block))
    dtype = ("bfloat16" if jax.default_backend() == "tpu" else "float32")
    out = _esrgan_jit(params, np.asarray(inp_rgb)[None], cfg, dtype,
                      "stack12")
    return np.asarray(out[0])


def record(args) -> int:
    from neural_enhanced_super_resolution_tpu.utils.io import imread_rgb

    entries = []
    for path in args.images:
        clean = imread_rgb(path)
        h, w = clean.shape[:2]
        crop = clean[:min(h, args.crop), :min(w, args.crop)]
        deg = degrade(crop)
        ref_out = run_reference(args.weights, deg)
        entries.append((os.path.basename(path), crop, deg, ref_out))
        print(f"{path}: ref PSNR vs clean = "
              f"{psnr(_match(ref_out, crop), crop):.3f} dB")
    np.savez_compressed(
        args.record,
        names=np.array([e[0] for e in entries]),
        **{f"clean_{i}": e[1] for i, e in enumerate(entries)},
        **{f"degraded_{i}": e[2] for i, e in enumerate(entries)},
        **{f"ref_{i}": e[3] for i, e in enumerate(entries)})
    print(f"recorded {len(entries)} goldens -> {args.record}")
    return 0


def _match(out: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Resize the x4 output back to the clean original's geometry."""
    from neural_enhanced_super_resolution_tpu.ops.resize import resize
    th, tw = target.shape[:2]
    if out.shape[:2] == (th, tw):
        return out
    return np.asarray(resize(out, dsize=(tw, th), interpolation="bicubic"))


def check(args) -> int:
    data = np.load(args.check, allow_pickle=False)
    names = [str(n) for n in data["names"]]
    worst = 0.0
    print(f"{'image':24s} {'ref dB':>8s} {'ours dB':>8s} {'dPSNR':>7s} "
          f"{'max|diff|':>9s}")
    for i, name in enumerate(names):
        clean = data[f"clean_{i}"]
        deg = data[f"degraded_{i}"]
        ref_out = data[f"ref_{i}"]
        ours = run_ours(args.weights, deg)
        p_ref = psnr(_match(ref_out, clean), clean)
        p_ours = psnr(_match(ours, clean), clean)
        d = abs(p_ours - p_ref)
        worst = max(worst, d)
        mad = int(np.abs(ours.astype(int) - ref_out.astype(int)).max())
        print(f"{name:24s} {p_ref:8.3f} {p_ours:8.3f} {d:7.3f} {mad:9d}")
    ok = worst <= args.tolerance
    print(f"worst |dPSNR| = {worst:.3f} dB "
          f"({'PASS' if ok else 'FAIL'}, tolerance {args.tolerance})")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--record", metavar="NPZ",
                      help="run the PyTorch reference, record goldens")
    mode.add_argument("--check", metavar="NPZ",
                      help="replay goldens through this framework")
    ap.add_argument("--weights", required=True,
                    help="RealESRGAN_x2plus.pth checkpoint path")
    ap.add_argument("--images", nargs="*", default=[],
                    help="input images (record mode)")
    ap.add_argument("--crop", type=int, default=512,
                    help="max crop edge for the test region")
    ap.add_argument("--tolerance", type=float, default=0.1,
                    help="max |dPSNR| in dB (BASELINE.md contract)")
    args = ap.parse_args()
    if args.record and not args.images:
        ap.error("--record requires --images")
    return record(args) if args.record else check(args)


if __name__ == "__main__":
    sys.exit(main())
