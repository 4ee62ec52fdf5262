"""``nesr`` — drop-in alias for the TPU-native framework.

Code written against the reference package
(``from nesr import SuperResolutionPipeline``, /root/reference/nesr/__init__.py:11)
works unchanged; everything re-exports from
``neural_enhanced_super_resolution_tpu``.
"""

from neural_enhanced_super_resolution_tpu import (SuperResolutionPipeline,
                                                  __version__)
from neural_enhanced_super_resolution_tpu import utils  # noqa: F401

__all__ = ["SuperResolutionPipeline", "__version__", "utils"]
