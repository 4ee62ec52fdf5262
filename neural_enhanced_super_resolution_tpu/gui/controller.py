"""Toolkit-independent GUI controller (view-model layer).

All the logic behind the reference's PyQt5 application
(/root/reference/nesr/gui/app.py) lives here, decoupled from any widget
toolkit so it is unit-testable headlessly (the reference's GUI logic is
welded to Qt and untestable — SURVEY.md §4):

  * degradation preview/apply/reset state     (app.py:1476-1565)
  * enhancement presets                       (app.py:935-986)
  * settings dicts (enhancement + advanced)   (app.py:914-927, :1153-1173)
  * worker threads with progress/image/finish/error events
    (EnhancementWorker / ModelDownloadWorker, app.py:72-163), including the
    0.5 s progress throttle and cooperative cancellation
  * model availability checks                 (app.py:1364-1388)

The Qt view in gui/app.py binds these to widgets when PyQt5 is installed.
"""

from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

logger = logging.getLogger("nesr.gui")

__all__ = ["DegradationState", "EnhancementSettingsState", "PRESETS",
           "EnhancementWorker", "ModelDownloadWorker", "check_model_status"]


# ---------------------------------------------------------------- presets ---

PRESETS = {
    # The reference's four presets, exact values (app.py:935-986; its
    # denoise slider is 0-10, stored here /10 like the pipeline expects).
    "Default": {"iterations": 3, "upscale_factor": 2.0, "use_esrgan": True,
                "use_diffusion": True, "segment_enhancement": True,
                "prompt": "a high resolution detailed photograph",
                "denoise_level": 0.5, "adaptive_sharpening": True},
    "High Quality": {"iterations": 3, "upscale_factor": 2.0,
                     "use_esrgan": True, "use_diffusion": True,
                     "segment_enhancement": True,
                     "prompt": "a highly detailed professional photograph",
                     "denoise_level": 0.3, "adaptive_sharpening": True},
    "Fast": {"iterations": 2, "upscale_factor": 2.0, "use_esrgan": True,
             "use_diffusion": False, "segment_enhancement": False,
             "prompt": "", "denoise_level": 0.5,
             "adaptive_sharpening": True},
    # Reference's accelerator preset (kept under its original name for
    # config compatibility; device aliasing maps mps-era settings to TPU).
    "Apple Silicon Optimized": {"iterations": 2, "upscale_factor": 2.0,
                                "use_esrgan": True, "use_diffusion": True,
                                "segment_enhancement": False,
                                "prompt": "a detailed photograph",
                                "denoise_level": 0.5,
                                "adaptive_sharpening": True},
}


@dataclass
class EnhancementSettingsState:
    """Settings the Enhancement + Advanced tabs hold (app.py:914-927,
    :1153-1173)."""
    iterations: int = 3
    upscale_factor: float = 2.0
    use_esrgan: bool = True
    use_diffusion: bool = True
    # a REAL branch here (models/swinir.py), unlike the reference's
    # unimplemented placeholder; off by default like its config
    use_swinir: bool = False
    segment_enhancement: bool = True
    denoise_level: float = 0.5
    adaptive_sharpening: bool = True
    prompt: str = ""
    # advanced
    force_3channel: bool = False
    max_tile_size: int = 512
    enable_tiling: bool = True
    device: str = "auto"
    output_dir: str = "outputs"
    intermediate_saves: bool = False

    def apply_preset(self, name: str) -> None:
        for key, value in PRESETS[name].items():
            setattr(self, key, value)

    def to_config(self) -> dict:
        return {
            "iterations": self.iterations,
            "upscale_factor": self.upscale_factor,
            "use_esrgan": self.use_esrgan,
            "use_diffusion": self.use_diffusion,
            "use_swinir": self.use_swinir,
            "segment_enhancement": self.segment_enhancement,
            "denoise_level": self.denoise_level,
            "adaptive_sharpening": self.adaptive_sharpening,
            "force_3channel": self.force_3channel,
            "max_tile_size": self.max_tile_size,
            "enable_tiling": self.enable_tiling,
            "output_dir": self.output_dir,
            "intermediate_saves": self.intermediate_saves,
        }


# ------------------------------------------------------------ degradation ---

@dataclass
class DegradationState:
    """Degradation tab state machine (app.py:1476-1565): load an original,
    preview a degraded version, apply it as the working image, reset."""
    original: np.ndarray | None = None
    degraded: np.ndarray | None = None

    def load(self, image: np.ndarray) -> None:
        self.original = np.asarray(image)
        self.degraded = None

    def preview(self, downscale: float = 1.0, noise_type: str = "gaussian",
                noise_amount: float = 0.0, blur_type: str = "gaussian",
                blur_radius: int = 0, jpeg_quality: int = 100,
                rng: np.random.Generator | None = None) -> np.ndarray:
        """Apply the degradation chain in the reference's order:
        downsample -> noise -> blur -> jpeg (degrade_image, app.py:1567-1617).
        """
        if self.original is None:
            raise ValueError("no image loaded")
        from neural_enhanced_super_resolution_tpu.utils.image_utils import (
            add_noise, apply_jpeg_compression, blur_image, downsample_image)
        img = self.original
        if downscale < 1.0:
            img = downsample_image(img, downscale)
        if noise_amount > 0:
            img = add_noise(img, noise_type, noise_amount, rng=rng)
        if blur_radius > 0:
            img = blur_image(img, blur_type, blur_radius)
        if jpeg_quality < 100:
            img = apply_jpeg_compression(img, jpeg_quality)
        self.degraded = np.asarray(img)
        return self.degraded

    def apply(self) -> np.ndarray:
        if self.degraded is None:
            raise ValueError("no degraded preview to apply")
        return self.degraded

    def reset(self) -> np.ndarray:
        if self.original is None:
            raise ValueError("no image loaded")
        self.degraded = None
        return self.original


# ---------------------------------------------------------------- workers ---

class EnhancementWorker:
    """Background enhancement thread (EnhancementWorker, app.py:72-138).

    Events are plain callables (the Qt view connects them to signals):
    on_progress(stage, iter, total, msg) — throttled to one per 0.5 s like
    the reference; on_image(np_image); on_finished(path); on_error(msg).
    Cancellation is cooperative via .stop(), and — unlike the reference,
    whose pipeline ignores the callback return value (SURVEY.md §3.4) — the
    pipeline is re-checked between stages via the throttle callback.
    """

    PROGRESS_THROTTLE_S = 0.5

    def __init__(self, pipeline, image_path: str, prompt: str | None = None,
                 on_progress: Callable = None, on_image: Callable = None,
                 on_finished: Callable = None, on_error: Callable = None):
        self.pipeline = pipeline
        self.image_path = image_path
        self.prompt = prompt
        self.on_progress = on_progress
        self.on_image = on_image
        self.on_finished = on_finished
        self.on_error = on_error
        self.running = False
        self._last_emit = 0.0
        self._thread: threading.Thread | None = None

    def _progress(self, stage, iteration, total, message):
        if not self.running:
            raise _Cancelled()
        now = time.monotonic()
        if (now - self._last_emit >= self.PROGRESS_THROTTLE_S
                or stage in ("Complete", "Enhancement")):
            self._last_emit = now
            if self.on_progress:
                self.on_progress(stage, iteration, total, message)

    def _run(self):
        from neural_enhanced_super_resolution_tpu.pipeline import (
            EnhancementCancelled)
        try:
            self.pipeline.config["progress_callback"] = self._progress
            # Mid-stage cancellation: the pipeline polls this between tile
            # batches (parallel/tiling.process_tiled) and iterations, so
            # stop() interrupts a long tile sweep at the next chunk
            # boundary instead of waiting for the stage to finish.
            self.pipeline.config["cancel_check"] = lambda: not self.running
            if self.on_image:
                self.pipeline.config["image_callback"] = self.on_image
            path = self.pipeline.enhance_image(self.image_path, self.prompt)
            if self.running and self.on_finished:
                self.on_finished(path)
        except (_Cancelled, EnhancementCancelled):
            logger.info("Enhancement cancelled")
        except Exception as exc:  # noqa: BLE001 - surfaced to the UI
            logger.error("Enhancement failed: %s", exc)
            if self.on_error:
                self.on_error(str(exc))
        finally:
            self.running = False

    def start(self):
        self.running = True
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self.running = False

    def join(self, timeout=None):
        if self._thread:
            self._thread.join(timeout)


class _Cancelled(Exception):
    pass


class ModelDownloadWorker:
    """Background model download (ModelDownloadWorker, app.py:140-163)."""

    def __init__(self, model_keys=None, on_progress: Callable = None,
                 on_finished: Callable = None, on_error: Callable = None):
        self.model_keys = model_keys
        self.on_progress = on_progress
        self.on_finished = on_finished
        self.on_error = on_error
        self._thread: threading.Thread | None = None

    def _run(self):
        try:
            from neural_enhanced_super_resolution_tpu.utils.downloader import (
                download_models)
            results = download_models(self.model_keys, self.on_progress)
            if self.on_finished:
                self.on_finished(results)
        except Exception as exc:  # noqa: BLE001
            if self.on_error:
                self.on_error(str(exc))

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def join(self, timeout=None):
        if self._thread:
            self._thread.join(timeout)


def check_model_status() -> dict:
    """Model availability for the check-on-start dialog (app.py:1364-1388)."""
    from neural_enhanced_super_resolution_tpu.utils.downloader import (
        check_models_exist, get_model_info)
    info = get_model_info()
    existing = check_models_exist()
    missing_required = [k for k, v in info.items()
                        if v["required"] and not existing.get(k)]
    return {"info": info, "missing_required": missing_required}


# ----------------------------------------------------------- view logic ----
# Headless image-viewer state (reference ImageViewer, gui/app.py:165-535):
# zoom/fit math and view composition live here so they are testable without
# Qt; gui/app.py's ImageViewer is a thin shell over these.

VIEW_MODES = ("side-by-side", "split", "before", "after")
ZOOM_MIN, ZOOM_MAX = 0.1, 4.0  # reference: 10-400%


def fit_zoom(image_hw: tuple, viewport_hw: tuple) -> float:
    """Zoom factor that fits the image inside the viewport, clamped to the
    reference's 10-400% range (fit-to-view, reference app.py:262-276)."""
    ih, iw = image_hw
    vh, vw = viewport_hw
    if ih <= 0 or iw <= 0:
        return 1.0
    z = min(vh / ih, vw / iw)
    return float(min(ZOOM_MAX, max(ZOOM_MIN, z)))


def compose_view(before, after, mode: str = "side-by-side",
                 split_pos: float = 0.5):
    """Compose the displayed array for a view mode.

    split: before pixels left of the (draggable) divider, after pixels right
    of it, 3-px red divider at ``split_pos`` (0..1) — the reference's
    interactive split view (app.py:338-430). after is resized to before's
    geometry first so columns align.
    """
    import numpy as np

    from neural_enhanced_super_resolution_tpu.utils.image_utils import (
        create_comparison_image)

    if before is None and after is None:
        return None
    if after is None or mode == "before":
        return np.asarray(before)
    if before is None or mode == "after":
        return np.asarray(after)
    if mode == "split":
        before = np.asarray(before)
        after = np.asarray(after)
        h, w = before.shape[:2]
        if after.shape[:2] != (h, w):
            after = _resize_like(after, (w, h))
        split_pos = min(1.0, max(0.0, float(split_pos)))
        x = int(round(split_pos * (w - 1)))
        out = after.copy()
        out[:, :x] = before[:, :x]
        lo, hi = max(0, x - 1), min(w, x + 2)
        out[:, lo:hi] = (255, 0, 0)
        return out
    return create_comparison_image(np.asarray(before), np.asarray(after),
                                   "horizontal")


def _resize_like(img, dsize):
    from neural_enhanced_super_resolution_tpu.ops.resize import resize
    import numpy as np
    return np.asarray(resize(img, dsize=dsize, interpolation="lanczos4"))


def drag_split_position(x_px: int, width_px: int) -> float:
    """Mouse x within the view -> divider position (0..1)."""
    if width_px <= 1:
        return 0.5
    return min(1.0, max(0.0, x_px / (width_px - 1)))
