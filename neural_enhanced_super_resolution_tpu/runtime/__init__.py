"""Runtime layer: device/precision policy, config system, stage profiling."""

from neural_enhanced_super_resolution_tpu.runtime.config import (
    default_config, merge_config)
from neural_enhanced_super_resolution_tpu.runtime.device import (
    accelerator_present, default_compute_dtype, determine_device)
from neural_enhanced_super_resolution_tpu.runtime.profiler import StageTimer
from neural_enhanced_super_resolution_tpu.runtime.distributed import (
    init_multihost, make_hybrid_mesh)

__all__ = ["default_config", "merge_config", "accelerator_present",
           "default_compute_dtype", "determine_device", "StageTimer",
           "init_multihost", "make_hybrid_mesh"]
