"""JAX model zoo (layer L3'): RRDBNet, SegFormer, SD-x4 diffusion stack."""

from neural_enhanced_super_resolution_tpu.models.rrdbnet import (
    RRDBNetConfig, init_rrdbnet, rrdbnet_forward, pixel_unshuffle)
from neural_enhanced_super_resolution_tpu.models.weights import (
    load_state_dict, rrdbnet_params_from_state_dict, rrdbnet_state_dict_keys)

__all__ = [
    "RRDBNetConfig", "init_rrdbnet", "rrdbnet_forward", "pixel_unshuffle",
    "load_state_dict", "rrdbnet_params_from_state_dict",
    "rrdbnet_state_dict_keys",
]
