"""RRDBNet parity tests vs. an independent PyTorch implementation.

A minimal torch RRDBNet (written here, mirroring the published Real-ESRGAN
architecture semantics: dense blocks, 0.2 residual scaling, nearest-x2
upsampling, pixel-unshuffle for scale<4) generates random weights; checkpoints
round-trip through our converter and the JAX forward must match torch to
float32 tolerance. This covers both the reference's 12-channel quirk mode
(/root/reference/nesr/nesr.py:216) and the standard 3-channel x2plus form.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from neural_enhanced_super_resolution_tpu.models import (
    RRDBNetConfig, init_rrdbnet, rrdbnet_forward,
    load_state_dict, rrdbnet_params_from_state_dict, rrdbnet_state_dict_keys)


class _TorchRDB(nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
        self.act = nn.LeakyReLU(0.2, inplace=False)

    def forward(self, x):
        x1 = self.act(self.conv1(x))
        x2 = self.act(self.conv2(torch.cat((x, x1), 1)))
        x3 = self.act(self.conv3(torch.cat((x, x1, x2), 1)))
        x4 = self.act(self.conv4(torch.cat((x, x1, x2, x3), 1)))
        x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
        return x + 0.2 * x5


class _TorchRRDB(nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.rdb1 = _TorchRDB(nf, gc)
        self.rdb2 = _TorchRDB(nf, gc)
        self.rdb3 = _TorchRDB(nf, gc)

    def forward(self, x):
        return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))


class _TorchRRDBNet(nn.Module):
    def __init__(self, num_in_ch, num_out_ch, scale, nf, nb, gc):
        super().__init__()
        self.scale = scale
        in_ch = num_in_ch * {4: 1, 2: 4, 1: 16}[scale]
        self.conv_first = nn.Conv2d(in_ch, nf, 3, 1, 1)
        self.body = nn.Sequential(*[_TorchRRDB(nf, gc) for _ in range(nb)])
        self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = nn.Conv2d(nf, num_out_ch, 3, 1, 1)
        self.act = nn.LeakyReLU(0.2, inplace=False)

    def forward(self, x):
        if self.scale == 2:
            x = F.pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = F.pixel_unshuffle(x, 4)
        feat = self.conv_first(x)
        feat = feat + self.conv_body(self.body(feat))
        feat = self.act(self.conv_up1(F.interpolate(feat, scale_factor=2,
                                                    mode="nearest")))
        feat = self.act(self.conv_up2(F.interpolate(feat, scale_factor=2,
                                                    mode="nearest")))
        return self.conv_last(self.act(self.conv_hr(feat)))


def _run_parity(num_in_ch, scale, h, w, nb=2, nf=16, gc=8, tol=1e-3):
    torch.manual_seed(0)
    tmodel = _TorchRRDBNet(num_in_ch, 3, scale, nf, nb, gc).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = rrdbnet_params_from_state_dict(sd, num_block=nb)
    cfg = RRDBNetConfig(num_in_ch=num_in_ch, num_out_ch=3, scale=scale,
                        num_feat=nf, num_block=nb, num_grow_ch=gc)

    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, num_in_ch), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(rrdbnet_forward(params, jnp.asarray(x), cfg,
                                      compute_dtype="float32"))
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max()
    assert err < tol, f"max abs err {err}"
    return params, cfg, x, ref


def test_rrdbnet_12channel_quirk_mode_matches_torch():
    # The reference's actual construction: 12 input channels, scale 4,
    # no pixel-unshuffle — output is 4x the input resolution.
    _run_parity(num_in_ch=12, scale=4, h=12, w=10)


def test_rrdbnet_x2plus_mode_matches_torch():
    # Standard x2plus semantics: 3 channels, pixel-unshuffle, net x2.
    _run_parity(num_in_ch=3, scale=2, h=16, w=12)


def test_rrdbnet_bf16_close_to_f32():
    params, cfg, x, ref = _run_parity(num_in_ch=3, scale=2, h=16, w=12)
    bf16 = np.asarray(rrdbnet_forward(params, jnp.asarray(x), cfg,
                                      compute_dtype="bfloat16"))
    # bf16 matmuls with f32 accumulation: small drift, same image.
    assert np.abs(bf16 - ref).max() < 0.05


def test_pth_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(1)
    tmodel = _TorchRRDBNet(3, 3, 2, 16, 2, 8).eval()
    path = str(tmp_path / "weights.pth")
    torch.save({"params_ema": tmodel.state_dict()}, path)
    sd = load_state_dict(path)
    assert set(sd.keys()) == set(rrdbnet_state_dict_keys(num_block=2))
    params = rrdbnet_params_from_state_dict(sd, num_block=2)
    cfg = RRDBNetConfig(3, 3, 2, 16, 2, 8)
    rng = np.random.default_rng(1)
    x = rng.random((1, 8, 8, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = np.asarray(rrdbnet_forward(params, jnp.asarray(x), cfg,
                                      compute_dtype="float32"))
    assert np.abs(ours - ref.numpy().transpose(0, 2, 3, 1)).max() < 1e-3


def test_real_checkpoint_keys_cover_x2plus():
    # The full 23-block key set matches the published checkpoint layout.
    keys = rrdbnet_state_dict_keys(23)
    assert len(keys) == 12 + 23 * 30
    assert "body.22.rdb3.conv5.bias" in keys


def test_fused_rdb_layout_matches_stock():
    """fuse_rrdbnet_params is an exact reparameterisation (MXU-shaped RDB)."""
    import jax
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        fuse_rrdbnet_params)
    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=16,
                        num_block=3, num_grow_ch=8)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
    fused = fuse_rrdbnet_params(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 10, 12, 12), dtype=np.float32))
    a = np.asarray(rrdbnet_forward(params, x, cfg, "float32"))
    b = np.asarray(rrdbnet_forward(fused, x, cfg, "float32"))
    assert np.abs(a - b).max() < 1e-5


def test_state_dict_export_roundtrip():
    """params -> basicsr state dict -> params is the identity."""
    import jax
    from neural_enhanced_super_resolution_tpu.models.weights import (
        rrdbnet_state_dict_from_params)
    cfg = RRDBNetConfig(3, 3, 2, 8, 2, 4)
    params = init_rrdbnet(jax.random.PRNGKey(3), cfg)
    sd = rrdbnet_state_dict_from_params(params, cfg.num_block)
    assert set(sd.keys()) == set(rrdbnet_state_dict_keys(cfg.num_block))
    back = rrdbnet_params_from_state_dict(sd, num_block=cfg.num_block)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_save_state_dict_formats(tmp_path):
    import jax
    from neural_enhanced_super_resolution_tpu.models.weights import (
        rrdbnet_state_dict_from_params, save_state_dict)
    cfg = RRDBNetConfig(3, 3, 2, 8, 2, 4)
    params = init_rrdbnet(jax.random.PRNGKey(3), cfg)
    sd = rrdbnet_state_dict_from_params(params, cfg.num_block)
    for name in ("w.safetensors", "w.pth"):
        path = str(tmp_path / name)
        save_state_dict(sd, path)
        loaded = load_state_dict(path)
        assert set(loaded.keys()) == set(sd.keys())
        back = rrdbnet_params_from_state_dict(loaded, num_block=2)
        x = jnp.zeros((1, 8, 8, 3))
        out = rrdbnet_forward(back, x, cfg, "float32")
        assert out.shape == (1, 16, 16, 3)


def test_folded_head_exact():
    """conv3x3-over-nearest2 folds and the s2d hr/last pair are exact
    reparameterisations of the reference head (f32)."""
    import jax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, init_rrdbnet, rrdbnet_forward)

    for scale in (4, 2):
        cfg = RRDBNetConfig(num_in_ch=12 if scale == 4 else 3, num_out_ch=3,
                            scale=scale, num_feat=16, num_block=1,
                            num_grow_ch=8)
        params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.uniform(0, 1, (1, 16, 16, cfg.num_in_ch))
                        .astype(np.float32))
        ref = rrdbnet_forward(params, x, cfg, "float32")
        folded = rrdbnet_forward(fuse_rrdbnet_params(params), x, cfg,
                                 "float32")
        assert folded.shape == ref.shape
        assert float(jnp.max(jnp.abs(folded - ref))) < 1e-4


def test_rows_s2d_forward_matches_fused():
    """The rows-s2d Pallas trunk (interpret mode off-TPU) matches the fused
    XLA path to bf16 rounding."""
    import jax

    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, fuse_rrdbnet_params_s2d,
        init_rrdbnet, rrdbnet_forward)

    cfg = RRDBNetConfig(num_in_ch=12, num_out_ch=3, scale=4, num_feat=16,
                        num_block=1, num_grow_ch=8)
    params = init_rrdbnet(jax.random.PRNGKey(1), cfg)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.uniform(0, 1, (1, 16, 16, 12)).astype(np.float32))
    ref = rrdbnet_forward(fuse_rrdbnet_params(params), x, cfg, "bfloat16")
    s2d = rrdbnet_forward(fuse_rrdbnet_params_s2d(params), x, cfg,
                          "bfloat16")
    assert float(jnp.max(jnp.abs(s2d - ref))) < 3e-2


def test_rows_s2d_conv_kernel_matches_xla():
    """kernels/rdb_pallas.rows_s2d_conv3x3 == lax.conv (interpret mode)."""
    from jax import lax

    from neural_enhanced_super_resolution_tpu.kernels.rdb_pallas import (
        from_rows_s2d, rearrange_w_rows_s2d, rows_s2d_conv3x3, to_rows_s2d)

    r = np.random.default_rng(2)
    for cin, cout in [(64, 192), (32, 160), (32, 64)]:
        x = r.normal(0, 1, (2, 16, 32, cin)).astype(np.float32)
        w = r.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32)
        ref = lax.conv_general_dilated(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = from_rows_s2d(rows_s2d_conv3x3(
            to_rows_s2d(jnp.asarray(x)),
            jnp.asarray(rearrange_w_rows_s2d(w))))
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        assert err < 0.1, (cin, cout, err)


def test_int8_trunk_forward_close_to_f32(rng):
    """Quantized trunk (fuse_rrdbnet_params_int8) stays close to the exact
    forward on random weights — the structural check behind the trained-
    fixture quality gate (tests/test_quality.py)."""
    import jax
    import jax.numpy as jnp
    from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
        RRDBNetConfig, fuse_rrdbnet_params, fuse_rrdbnet_params_int8,
        init_rrdbnet, rrdbnet_forward)

    cfg = RRDBNetConfig(num_in_ch=3, num_out_ch=3, scale=4, num_feat=8,
                        num_block=2, num_grow_ch=4)
    raw = init_rrdbnet(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32))
    exact = np.asarray(rrdbnet_forward(fuse_rrdbnet_params(raw), x, cfg,
                                       "float32"))
    q = np.asarray(rrdbnet_forward(fuse_rrdbnet_params_int8(raw), x, cfg,
                                   "float32"))
    assert q.shape == exact.shape == (1, 64, 96, 3)
    scale = max(1e-6, float(np.abs(exact).max()))
    rel = float(np.abs(q - exact).max()) / scale
    assert rel < 0.05, rel  # int8 quantisation noise, not divergence
