"""``nesr`` — drop-in alias for the TPU-native framework.

Code written against the reference package works unchanged, including
SUBMODULE imports (``import nesr.utils.image_utils``,
``from nesr.utils.downloader import download_models``,
``from nesr.gui import NESRApplication``, ``from nesr.nesr import
SuperResolutionPipeline`` — the module paths the reference exposes,
/root/reference/nesr/__init__.py:11, nesr/utils/__init__.py:6-13).
Everything re-exports from ``neural_enhanced_super_resolution_tpu``; the
submodule aliases are registered in sys.modules so both attribute access
and ``import nesr.x.y`` resolve.
"""

import sys as _sys

from neural_enhanced_super_resolution_tpu import (SuperResolutionPipeline,
                                                  __version__)
from neural_enhanced_super_resolution_tpu import utils  # noqa: F401
from neural_enhanced_super_resolution_tpu import pipeline as _pipeline
from neural_enhanced_super_resolution_tpu.utils import (downloader as
                                                        _downloader)
from neural_enhanced_super_resolution_tpu.utils import (image_utils as
                                                        _image_utils)
from neural_enhanced_super_resolution_tpu.utils import metrics as _metrics

# Reference module paths -> our modules. ``nesr.nesr`` is the reference's
# pipeline module. Registration must be eager: ``import nesr.x.y`` consults
# sys.modules / the package __path__, never module __getattr__. The gui
# module is safe to import headless (its Qt view is import-gated, HAS_QT).
from neural_enhanced_super_resolution_tpu import gui as _gui  # noqa: E402

_sys.modules[__name__ + ".utils"] = utils
_sys.modules[__name__ + ".utils.downloader"] = _downloader
_sys.modules[__name__ + ".utils.image_utils"] = _image_utils
_sys.modules[__name__ + ".utils.metrics"] = _metrics
_sys.modules[__name__ + ".nesr"] = _pipeline
_sys.modules[__name__ + ".gui"] = _gui
gui = _gui
nesr = _pipeline

__all__ = ["SuperResolutionPipeline", "__version__", "utils", "nesr", "gui"]
