#!/usr/bin/env python3
"""Train a tiny RRDBNet x4 on patches of the repo test image.

Demonstrates the framework's training path (rrdbnet_forward is pure JAX and
fully differentiable — the reference has no training capability at all) and
produces a small *trained* checkpoint used by the quality integration test
(tests/fixtures/tiny_trained_x4.safetensors): unlike random weights, this
model genuinely beats bicubic upsampling on held-out patches, so the
degrade->enhance->PSNR round trip (SURVEY.md §4) becomes a real quality gate.

Usage: python tools/train_tiny_esrgan.py [--steps 800] [--out PATH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--patch", type=int, default=48, help="HR patch size")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "tiny_trained_x4.safetensors"))
    args = parser.parse_args(argv)

    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, init_rrdbnet, rrdbnet_forward)
    from neural_enhanced_super_resolution_tpu.models.weights import (
        rrdbnet_state_dict_from_params, save_state_dict)
    from neural_enhanced_super_resolution_tpu.ops.resize import resize
    from neural_enhanced_super_resolution_tpu.utils.io import imread_rgb

    img = imread_rgb(os.path.join(os.path.dirname(__file__), "..", "tests",
                                  "fixtures", "test.jpeg")).astype(np.float32)
    h, w = img.shape[:2]
    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=16,
                        num_block=2, num_grow_ch=8)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)

    # Precompute LR (x4 bicubic downsample) once; crops pair up spatially.
    # The pipeline always CLAHE-preprocesses before ESRGAN (_preprocess_image,
    # reference nesr.py:679-687), so train on the same distribution.
    from neural_enhanced_super_resolution_tpu.ops.enhance import preprocess
    lr_u8 = np.asarray(resize(img.astype(np.uint8), dsize=(w // 4, h // 4),
                              interpolation="bicubic"))
    lr_full = np.asarray(preprocess(lr_u8, 0)).astype(np.float32)

    rng = np.random.default_rng(0)
    ps = args.patch
    lp = ps // 4

    def sample_batch():
        ys = rng.integers(0, h // 4 - lp, args.batch)
        xs = rng.integers(0, w // 4 - lp, args.batch)
        lr = np.stack([lr_full[y:y + lp, x:x + lp] for y, x in zip(ys, xs)])
        hr = np.stack([img[4 * y:4 * y + ps, 4 * x:4 * x + ps]
                       for y, x in zip(ys, xs)])
        return jnp.asarray(lr) / 255.0, jnp.asarray(hr) / 255.0

    from neural_enhanced_super_resolution_tpu.ops.blur import gaussian_blur

    def stack12(lr):
        # Same variant stack the pipeline builds at inference
        # (pipeline._esrgan_jit): [bgr, 1.1x, 0.9x, blur3(bgr)].
        bgr = lr[..., ::-1]
        blurred = jax.vmap(lambda t: gaussian_blur(t, (3, 3), 0.0))(bgr)
        return jnp.concatenate([bgr, jnp.clip(bgr * 1.1, 0, 1),
                                bgr * 0.9, blurred], axis=-1)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, lr, hr):
        def loss_fn(p):
            out = rrdbnet_forward(p, stack12(lr), cfg, "float32")
            return jnp.mean(jnp.abs(out[..., ::-1] - hr))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    first = last = None
    for i in range(args.steps):
        lr, hr = sample_batch()
        params, opt_state, loss = step(params, opt_state, lr, hr)
        if i == 0:
            first = float(loss)
        if i % 100 == 0 or i == args.steps - 1:
            last = float(loss)
            print(f"step {i:5d} loss {last:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    sd = rrdbnet_state_dict_from_params(params, cfg.num_block)
    save_state_dict(sd, args.out)
    print(f"first loss {first:.4f} -> final {last:.4f}; saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
