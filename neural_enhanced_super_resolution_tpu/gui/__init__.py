"""GUI layer: toolkit-independent controller + PyQt5 view (import-gated).

Mirrors the reference's GUI component inventory (SURVEY.md §2a):
NESRApplication, EnhancementWorker, ModelDownloadWorker, ImageViewer,
LogConsole, and the settings widgets — with the logic extracted into
gui/controller.py so it is testable without a display.
"""

from neural_enhanced_super_resolution_tpu.gui.controller import (
    DegradationState, EnhancementSettingsState, EnhancementWorker,
    ModelDownloadWorker, PRESETS, check_model_status)
from neural_enhanced_super_resolution_tpu.gui.app import (NESRApplication,
                                                          run_gui, HAS_QT)

__all__ = ["DegradationState", "EnhancementSettingsState",
           "EnhancementWorker", "ModelDownloadWorker", "PRESETS",
           "check_model_status", "NESRApplication", "run_gui", "HAS_QT"]
