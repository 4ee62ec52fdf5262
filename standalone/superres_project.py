#!/usr/bin/env python3
"""Monolithic single-file pipeline variant.

Role mirrors /root/reference/standalone/superres_project.py: an older-style,
eagerly-initialising pipeline in one file — 3-channel standard x2plus
semantics (pixel-unshuffle, net x2 per pass) instead of the package's
12-channel quirk mode, with --no_diffusion / --intermediate_saves flags.
Useful as a minimal readable end-to-end and as a second behavioral data
point next to the package pipeline.
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
logger = logging.getLogger("superres")


class SuperResolutionPipeline:
    """Eager-init, x2plus-semantics mini pipeline (standalone variant)."""

    def __init__(self, device: str = "auto", iterations: int = 2,
                 no_diffusion: bool = True, denoise_level: float = 0.5,
                 model_path: str | None = None):
        from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
            RRDBNetConfig)
        from neural_enhanced_super_resolution_tpu.models.weights import (
            load_state_dict, rrdbnet_params_from_state_dict)
        from neural_enhanced_super_resolution_tpu.runtime.device import (
            determine_device)

        self.device = determine_device(device)
        self.iterations = iterations
        self.denoise_level = denoise_level
        self.use_diffusion = not no_diffusion
        # Eager model init (unlike the package's lazy loading):
        # standard 3-channel x2plus form — pixel_unshuffle + net x2.
        from standalone.direct_esrgan import find_model_path
        path = find_model_path(model_path)
        if path is None:
            raise FileNotFoundError("RealESRGAN_x2plus weights not found")
        self.cfg = RRDBNetConfig(num_in_ch=3, num_out_ch=3, scale=2,
                                 num_feat=64, num_block=23, num_grow_ch=32)
        self.params = rrdbnet_params_from_state_dict(load_state_dict(path))
        logger.info("Loaded x2plus weights (3-channel mode) from %s", path)

    def _esrgan_x2(self, image: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
            rrdbnet_forward)
        x = jnp.asarray(image[..., ::-1]).astype(jnp.float32)[None] / 255.0
        # pad H, W to even for pixel-unshuffle
        h, w = x.shape[1], x.shape[2]
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        y = rrdbnet_forward(self.params, x, self.cfg, "bfloat16")[0]
        y = y[:2 * h, :2 * w]
        y = jnp.clip(y * 255.0, 0, 255).astype(jnp.uint8)
        return np.asarray(y[..., ::-1])

    def enhance(self, image_path: str, output_dir: str = "outputs",
                intermediate_saves: bool = False) -> str:
        from neural_enhanced_super_resolution_tpu.ops.enhance import (
            adaptive_sharpen, preprocess)
        from neural_enhanced_super_resolution_tpu.utils.io import (imread_rgb,
                                                                   imwrite_rgb)
        image = imread_rgb(image_path)
        oh = image.shape[0]
        current = image
        for i in range(self.iterations):
            t0 = time.time()
            current = np.asarray(preprocess(current, self.denoise_level))
            current = self._esrgan_x2(current)
            current = np.asarray(adaptive_sharpen(current))
            logger.info("Iteration %d done in %.1fs (%dx%d)", i + 1,
                        time.time() - t0, current.shape[1], current.shape[0])
            if intermediate_saves:
                imwrite_rgb(os.path.join(output_dir,
                                         f"intermediate_iter{i+1}.png"),
                            current)
        scale = round(current.shape[0] / oh, 1)
        base, ext = os.path.splitext(os.path.basename(image_path))
        out = os.path.join(output_dir, f"{base}_enhanced_x{scale}{ext}")
        imwrite_rgb(out, current)
        logger.info("Saved %s", out)
        return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Monolithic SR pipeline")
    parser.add_argument("--input", "-i", required=True)
    parser.add_argument("--output_dir", "-o", default="outputs")
    parser.add_argument("--iterations", "-n", type=int, default=2)
    parser.add_argument("--device", "-d", default="auto")
    parser.add_argument("--denoise_level", type=float, default=0.5)
    parser.add_argument("--model", default=None)
    parser.add_argument("--no_diffusion", action="store_true")
    parser.add_argument("--intermediate_saves", action="store_true")
    args = parser.parse_args(argv)
    try:
        pipe = SuperResolutionPipeline(args.device, args.iterations,
                                       args.no_diffusion,
                                       args.denoise_level, args.model)
        pipe.enhance(args.input, args.output_dir, args.intermediate_saves)
        return 0
    except Exception as exc:
        logger.error("%s", exc)
        return 1


if __name__ == "__main__":
    sys.exit(main())
