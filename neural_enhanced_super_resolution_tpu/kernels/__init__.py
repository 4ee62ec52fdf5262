"""Pallas TPU kernels.

Production: flash attention (attention.py) — used by the diffusion UNet's
latent self-attention and the VAE mid-block via ``attention_auto``.
Experimental (measured, not yet faster than XLA conv on v5e):
conv3x3.py / conv3x3_v2.py — see their docstrings and benchmarks/RESULTS.md.
"""

from neural_enhanced_super_resolution_tpu.kernels.attention import (
    attention_auto, flash_attention)
from neural_enhanced_super_resolution_tpu.kernels.conv3x3 import conv3x3_lrelu
from neural_enhanced_super_resolution_tpu.kernels.conv3x3_v2 import (
    conv3x3_lrelu_v2)

__all__ = ["attention_auto", "flash_attention", "conv3x3_lrelu",
           "conv3x3_lrelu_v2"]
