#!/usr/bin/env python3
"""Direct ESRGAN runner — component-isolation test with timing.

Role mirrors /root/reference/standalone/direct_esrgan.py (its docstring:
verify ESRGAN works "independent of the NESR framework"): a dependency-light
CLI that runs ONLY the RRDBNet upscaler on one image, with wall-clock timing
and model-path search — no diffusion, no segmentation, no pipeline.
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
logger = logging.getLogger("direct_esrgan")


def find_model_path(explicit: str | None = None) -> str | None:
    """Search the standard weight locations
    (reference direct_esrgan.py:183-236 semantics)."""
    fname = "RealESRGAN_x2plus.pth"
    candidates = [explicit] if explicit else []
    if "NESR_MODELS_DIR" in os.environ:
        candidates.append(os.path.join(os.environ["NESR_MODELS_DIR"],
                                       "weights", fname))
    home = os.path.expanduser("~")
    candidates += [
        os.path.join(home, ".nesr", "models", "weights", fname),
        os.path.join("models", "weights", fname),
        os.path.join("weights", fname),
    ]
    return next((c for c in candidates if c and os.path.exists(c)), None)


def enhance_image(input_path: str, output_path: str,
                  model_path: str | None = None, tile: int = 512,
                  tile_pad: int = 16, three_channel: bool = False) -> str:
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig)
    from neural_enhanced_super_resolution_tpu.models.weights import (
        load_state_dict, rrdbnet_params_from_state_dict)
    from neural_enhanced_super_resolution_tpu.parallel.tiling import (
        process_tiled)
    from neural_enhanced_super_resolution_tpu.pipeline import _esrgan_jit
    from neural_enhanced_super_resolution_tpu.utils.io import (imread_rgb,
                                                               imwrite_rgb)

    path = find_model_path(model_path)
    if path is None:
        raise FileNotFoundError("RealESRGAN_x2plus weights not found")
    logger.info("Model: %s", path)

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=64,
                        num_block=23, num_grow_ch=32)
    params = rrdbnet_params_from_state_dict(load_state_dict(path))
    image = imread_rgb(input_path)
    logger.info("Input: %s (%dx%d)", input_path, image.shape[1],
                image.shape[0])

    t0 = time.time()
    out = process_tiled(
        lambda tiles: _esrgan_jit(params, tiles, cfg, "bfloat16",
                                  "repeat12" if three_channel
                                  else "stack12"),
        image, tile_size=tile, halo=tile_pad, scale=4)
    import numpy as np
    out = np.asarray(out)  # fetch forces completion (block_until_ready can
    elapsed = time.time() - t0  # return early over remote-device tunnels)
    logger.info("Processing took %.2f seconds (%.2f MP/s input)", elapsed,
                image.shape[0] * image.shape[1] / 1e6 / elapsed)

    imwrite_rgb(output_path, out)
    logger.info("Saved: %s", output_path)
    return output_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Direct ESRGAN upscaler")
    parser.add_argument("input")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("-m", "--model", default=None)
    parser.add_argument("--tile", type=int, default=512)
    parser.add_argument("--tile_pad", type=int, default=16)
    parser.add_argument("--three_channel", action="store_true")
    args = parser.parse_args(argv)
    output = args.output or os.path.splitext(args.input)[0] + "_esrgan.png"
    try:
        enhance_image(args.input, output, args.model, args.tile,
                      args.tile_pad, args.three_channel)
        return 0
    except Exception as exc:
        logger.error("%s", exc)
        return 1


if __name__ == "__main__":
    sys.exit(main())
