"""neural_enhanced_super_resolution_tpu — TPU-native NESR.

A brand-new, TPU-first image super-resolution framework (JAX/XLA/Pallas) with the
capabilities of the NESR reference (gddickinson/neural_enhanced_super_resolution):
an iterative multi-model enhancement pipeline combining a Real-ESRGAN RRDBNet
backbone, the Stable Diffusion x4 latent upscaler, SegFormer-driven regional
enhancement, classical pre/post-processing, and a multi-model ensemble.

Public API mirrors the reference package (`/root/reference/nesr/__init__.py:11`):
the only public symbol is `SuperResolutionPipeline`.
"""

__version__ = "0.1.0"

from neural_enhanced_super_resolution_tpu.pipeline import SuperResolutionPipeline

__all__ = ["SuperResolutionPipeline", "__version__"]
