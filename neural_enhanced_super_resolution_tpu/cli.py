"""CLI entry point (layer L5').

Argument surface mirrors the reference's main.py:79-100 and adds the flags its
README documents but never wired up (--no_diffusion, --intermediate_saves —
SURVEY.md §5 "Config/flag system"). Unlike the reference, ``python -m
neural_enhanced_super_resolution_tpu`` (and the ``nesr`` alias package) works.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
logger = logging.getLogger("nesr")

__all__ = ["main", "parse_arguments", "run_cli_mode"]


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(
        description="NESR-TPU — Neural Enhanced Super-Resolution (TPU-native)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--gui", action="store_true",
                        help="Launch the graphical user interface")
    parser.add_argument("--cli", action="store_true",
                        help="Run in command line mode")
    parser.add_argument("--input", "-i", help="Input image path (CLI mode)")
    parser.add_argument("--output", "-o", help="Output path (CLI mode)")
    parser.add_argument("--config", "-c",
                        help="Path to configuration JSON file")
    parser.add_argument("--iterations", "-n", type=int, default=3,
                        help="Number of enhancement iterations")
    parser.add_argument("--upscale_factor", "-u", type=float, default=2.0,
                        help="Base upscale factor per iteration")
    parser.add_argument("--device", "-d", default="auto",
                        choices=["auto", "tpu", "cpu", "cuda"],
                        help="Device to run on (cuda accepted as an "
                             "accelerator alias)")
    parser.add_argument("--prompt", "-p", default=None,
                        help="Text prompt for diffusion guidance")
    parser.add_argument("--download_models", action="store_true",
                        help="Download required models")
    # Documented in the reference README but missing from its CLI:
    parser.add_argument("--use_swinir", action="store_true",
                        help="Enable the SwinIR branch (a REAL model here; "
                             "the reference documents this key but never "
                             "implements it)")
    parser.add_argument("--no_diffusion", action="store_true",
                        help="Disable the diffusion upscaler")
    parser.add_argument("--no_esrgan", action="store_true",
                        help="Disable the ESRGAN upscaler")
    parser.add_argument("--no_segmentation", action="store_true",
                        help="Disable segmentation-guided enhancement")
    parser.add_argument("--intermediate_saves", action="store_true",
                        help="Save the image after each iteration")
    parser.add_argument("--bench", action="store_true",
                        help="Print per-stage timing at the end")
    return parser.parse_args(argv)


def run_cli_mode(args) -> int:
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    print("Starting NESR-TPU in CLI mode")
    if args.download_models:
        from neural_enhanced_super_resolution_tpu.utils.downloader import (
            download_models)
        download_models()
        print("Model download complete.")
        return 0

    if not args.input:
        print("Error: Input image path is required in CLI mode.")
        print("Use --input or -i to specify the input image path.")
        return 2

    if os.path.isdir(args.input):
        return _run_batch_mode(args)

    config = None
    if args.config:
        try:
            with open(args.config) as f:
                config = json.load(f)
            print(f"Loaded configuration from {args.config}")
        except Exception as exc:
            print(f"Error loading configuration: {exc}")
            return 2

    base_config = {
        "iterations": args.iterations,
        "upscale_factor": args.upscale_factor,
        "output_dir": (os.path.dirname(args.output) or "outputs"
                       if args.output else "outputs"),
    }
    if args.use_swinir:
        base_config["use_swinir"] = True
    if args.no_diffusion:
        base_config["use_diffusion"] = False
    if args.no_esrgan:
        base_config["use_esrgan"] = False
    if args.no_segmentation:
        base_config["segment_enhancement"] = False
    if args.intermediate_saves:
        base_config["intermediate_saves"] = True

    if config:
        config.update(base_config)  # CLI args win (main.py:141-145)
    else:
        config = base_config

    try:
        pipeline = SuperResolutionPipeline(device=args.device, config=config)
        output_path = pipeline.enhance_image(args.input, prompt=args.prompt)
        if args.output and output_path != args.output:
            os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
            shutil.copy2(output_path, args.output)
            print(f"Enhanced image saved to: {args.output}")
        else:
            print(f"Enhanced image saved to: {output_path}")
        return 0
    except Exception as exc:
        print(f"Error during image enhancement: {exc}")
        return 1


def _run_batch_mode(args) -> int:
    """Directory input: stream every image through the serving executor
    (runtime/executor.py) so host staging overlaps device compute."""
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline
    from neural_enhanced_super_resolution_tpu.runtime.executor import (
        BatchExecutor)
    from neural_enhanced_super_resolution_tpu.utils.io import imwrite_rgb

    exts = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".webp"}
    paths = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input)
        if os.path.splitext(f)[1].lower() in exts)
    if not paths:
        print(f"No images found in {args.input}")
        return 2
    out_dir = args.output or "outputs"
    config = {}
    if args.config:  # JSON config applies in batch mode too; CLI args win
        try:
            with open(args.config) as f:
                config = json.load(f)
        except Exception as exc:
            print(f"Error loading configuration: {exc}")
            return 2
    config.update({"iterations": args.iterations,
                   "upscale_factor": args.upscale_factor,
                   "output_dir": out_dir})
    if args.use_swinir:
        config["use_swinir"] = True
    if args.no_diffusion:
        config["use_diffusion"] = False
    if args.no_esrgan:
        config["use_esrgan"] = False
    if args.no_segmentation:
        config["segment_enhancement"] = False
    pipeline = SuperResolutionPipeline(device=args.device, config=config)

    failures = 0
    with BatchExecutor(pipeline) as ex:
        for path, result in ex.map_paths(paths, prompt=args.prompt):
            if isinstance(result, Exception):
                print(f"FAILED {path}: {result}")
                failures += 1
                continue
            base, ext = os.path.splitext(os.path.basename(path))
            out_path = os.path.join(out_dir, f"{base}_enhanced{ext}")
            imwrite_rgb(out_path, result)
            print(f"{path} -> {out_path}")
    print(f"Batch complete: {len(paths) - failures}/{len(paths)} succeeded")
    return 1 if failures else 0


def launch_gui() -> int:
    try:
        from neural_enhanced_super_resolution_tpu.gui import run_gui
        return run_gui()
    except ImportError as exc:
        print(f"GUI unavailable ({exc}). Install PyQt5 or use --cli.")
        return 2


def main(argv=None) -> int:
    args = parse_arguments(argv)
    if args.gui or (not args.cli and not args.input
                    and not args.download_models):
        return launch_gui()
    return run_cli_mode(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
