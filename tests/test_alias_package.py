"""Drop-in import surface: every module path the reference exposes resolves
through the ``nesr`` alias package (SURVEY.md L4-L6 public interfaces —
/root/reference/nesr/__init__.py:11, nesr/utils/__init__.py:6-13,
nesr/gui/__init__.py:6)."""

import importlib

import pytest


@pytest.mark.parametrize("mod", [
    "nesr", "nesr.utils", "nesr.utils.image_utils",
    "nesr.utils.downloader", "nesr.utils.metrics", "nesr.gui", "nesr.nesr",
])
def test_reference_module_paths_import(mod):
    importlib.import_module(mod)


def test_reference_symbol_paths():
    from nesr import SuperResolutionPipeline as a
    from nesr.nesr import SuperResolutionPipeline as b
    assert a is b
    from nesr.utils.image_utils import (add_noise, blur_image,  # noqa: F401
                                        downsample_image,
                                        apply_jpeg_compression,
                                        create_comparison_image)
    from nesr.utils.downloader import (MODELS, download_models,  # noqa: F401
                                       check_models_exist, get_model_info)
    from nesr.gui import (NESRApplication, EnhancementWorker,  # noqa: F401
                          ModelDownloadWorker)
