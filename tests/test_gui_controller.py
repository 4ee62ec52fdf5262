"""Headless tests for the GUI controller layer (the reference's GUI logic is
untestable Qt-welded code; ours is a plain view-model — SURVEY.md §4)."""

import time

import numpy as np
import pytest

from neural_enhanced_super_resolution_tpu.gui.controller import (
    DegradationState, EnhancementSettingsState, EnhancementWorker, PRESETS)


def test_presets_cover_reference_set():
    # Exact preset names/values from the reference GUI (app.py:935-986).
    assert set(PRESETS) == {"Default", "High Quality", "Fast",
                            "Apple Silicon Optimized"}
    s = EnhancementSettingsState()
    s.apply_preset("Fast")
    assert s.iterations == 2 and not s.use_diffusion
    assert not s.segment_enhancement
    s.apply_preset("High Quality")
    assert s.iterations == 3 and s.denoise_level == 0.3
    assert s.prompt == "a highly detailed professional photograph"


def test_settings_to_config_keys_match_pipeline():
    from neural_enhanced_super_resolution_tpu.runtime.config import (
        default_config)
    cfg_keys = set(default_config())
    s = EnhancementSettingsState()
    assert set(s.to_config()).issubset(cfg_keys)


def test_degradation_state_machine(rng, test_image):
    d = DegradationState()
    with pytest.raises(ValueError):
        d.preview()
    d.load(test_image)
    out = d.preview(downscale=0.5, noise_amount=0.05, blur_radius=1,
                    jpeg_quality=80, rng=rng)
    assert out.shape[0] == test_image.shape[0] // 2
    assert np.array_equal(d.apply(), out)
    assert np.array_equal(d.reset(), test_image)
    assert d.degraded is None


class _FakePipeline:
    def __init__(self, delay=0.0, fail=False, iterations=3):
        self.config = {"iterations": iterations}
        self.delay = delay
        self.fail = fail

    def enhance_image(self, path, prompt=None):
        cb = self.config.get("progress_callback")
        for i in range(self.config["iterations"]):
            if cb:
                cb("Enhancement", i, self.config["iterations"], f"iter {i}")
            if self.delay:
                time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("boom")
        if self.config.get("image_callback"):
            self.config["image_callback"](np.zeros((4, 4, 3), np.uint8))
        if cb:
            cb("Complete", self.config["iterations"],
               self.config["iterations"], "done")
        return "/tmp/out.png"


def test_enhancement_worker_events():
    events = {"progress": [], "finished": [], "images": []}
    w = EnhancementWorker(
        _FakePipeline(), "in.png",
        on_progress=lambda *a: events["progress"].append(a),
        on_image=lambda im: events["images"].append(im.shape),
        on_finished=lambda p: events["finished"].append(p))
    w.start()
    w.join(10)
    assert events["finished"] == ["/tmp/out.png"]
    assert events["images"] == [(4, 4, 3)]
    assert any(e[0] == "Enhancement" for e in events["progress"])
    assert events["progress"][-1][0] == "Complete"


def test_enhancement_worker_error_event():
    errors = []
    w = EnhancementWorker(_FakePipeline(fail=True), "in.png",
                          on_error=errors.append)
    w.start()
    w.join(10)
    assert errors == ["boom"]


def test_enhancement_worker_cancellation_stops_pipeline():
    progressed = []
    w = EnhancementWorker(
        _FakePipeline(delay=0.05, iterations=100), "in.png",
        on_progress=lambda *a: progressed.append(a),
        on_finished=lambda p: progressed.append(("FINISHED",)))
    w.start()
    time.sleep(0.2)
    w.stop()
    w.join(10)
    # cancelled: no finish event, and the pipeline stopped mid-way
    assert ("FINISHED",) not in progressed
    assert len(progressed) < 100


def test_gui_import_without_qt():
    from neural_enhanced_super_resolution_tpu.gui import (HAS_QT,
                                                          NESRApplication)
    if not HAS_QT:
        with pytest.raises(ImportError):
            NESRApplication()


def test_fit_zoom_math():
    from neural_enhanced_super_resolution_tpu.gui.controller import fit_zoom

    assert fit_zoom((100, 200), (50, 200)) == 0.5      # height-bound
    assert fit_zoom((100, 100), (1000, 50)) == 0.5     # width-bound
    assert fit_zoom((10, 10), (10000, 10000)) == 4.0   # clamp to 400%
    assert fit_zoom((10000, 10000), (10, 10)) == 0.1   # clamp to 10%
    assert fit_zoom((0, 10), (10, 10)) == 1.0          # degenerate


def test_compose_view_modes():
    from neural_enhanced_super_resolution_tpu.gui.controller import (
        VIEW_MODES, compose_view)

    before = np.full((20, 30, 3), 10, np.uint8)
    after = np.full((20, 30, 3), 200, np.uint8)
    assert compose_view(None, None) is None
    np.testing.assert_array_equal(compose_view(before, None), before)
    np.testing.assert_array_equal(compose_view(before, after, "before"),
                                  before)
    np.testing.assert_array_equal(compose_view(before, after, "after"),
                                  after)
    sbs = compose_view(before, after, "side-by-side")
    assert sbs.shape[1] > 30  # widened comparison canvas
    assert set(VIEW_MODES) == {"side-by-side", "split", "before", "after"}


def test_compose_view_split_divider():
    from neural_enhanced_super_resolution_tpu.gui.controller import (
        compose_view, drag_split_position)

    before = np.full((10, 100, 3), 10, np.uint8)
    after = np.full((10, 100, 3), 200, np.uint8)
    out = compose_view(before, after, "split", split_pos=0.3)
    assert out.shape == (10, 100, 3)
    x = int(round(0.3 * 99))
    assert (out[:, :x - 1] == 10).all()           # before, left of divider
    assert (out[:, x + 2:] == 200).all()          # after, right of divider
    np.testing.assert_array_equal(out[0, x], (255, 0, 0))  # red divider

    # dragging maps pixels to positions, clamped
    assert drag_split_position(0, 100) == 0.0
    assert drag_split_position(99, 100) == 1.0
    assert abs(drag_split_position(50, 101) - 0.5) < 1e-9
    assert drag_split_position(-5, 100) == 0.0


def test_compose_view_split_resizes_mismatched():
    from neural_enhanced_super_resolution_tpu.gui.controller import (
        compose_view)

    before = np.full((10, 20, 3), 10, np.uint8)
    after = np.full((40, 80, 3), 200, np.uint8)   # 4x size
    out = compose_view(before, after, "split", split_pos=0.5)
    assert out.shape == (10, 20, 3)


def test_theme_fallback_ladder():
    """apply_theme degrades qtmodern -> Fusion -> default without raising
    (reference launch_gui's qtmodern fallback, main.py:190-205)."""
    from neural_enhanced_super_resolution_tpu.gui.app import apply_theme

    class FakeApp:
        def setStyle(self, name):
            self.style = name

    theme = apply_theme(FakeApp())
    assert theme in ("qtmodern-dark", "fusion", "default")
