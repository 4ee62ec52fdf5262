"""Stage-level pipeline-parallel overlap (SURVEY §2c PP row; VERDICT #7).

ESRGAN's tile batch runs data-parallel on one subset of the mesh while a
diffusion-like program owns the remaining devices; both are dispatched
before either is consumed (parallel/overlap.py). Correctness is asserted;
the measured sequential-vs-overlapped delta is printed as a note (wall-clock
assertions on shared CI CPUs are flaky by design).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_enhanced_super_resolution_tpu.parallel.overlap import (
    overlap_branches, split_mesh)
from neural_enhanced_super_resolution_tpu.parallel.sharded import (
    process_tiled_sharded)


@pytest.fixture()
def branches():
    mesh_a, devs_b = split_mesh(jax.devices(), diffusion_share=0.25)
    assert len(jax.devices()) == 8
    assert mesh_a.devices.size == 6 and len(devs_b) == 2

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    def model_fn(tiles):  # stand-in ESRGAN: x2 nearest + matmul-heavy work
        t = tiles.astype(jnp.float32)
        n, h, w, c = t.shape
        up = jnp.broadcast_to(t[:, :, None, :, None, :],
                              (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)
        return jnp.clip(up, 0, 255).astype(jnp.uint8)

    def esrgan_branch():
        return process_tiled_sharded(model_fn, image, mesh_a, tile_size=16,
                                     halo=4, scale=2)

    lat = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (1, 16, 16, 4)).astype(np.float32)),
        devs_b[0])
    w = jax.device_put(
        jnp.asarray(rng.normal(0, 0.1, (4, 4)).astype(np.float32)),
        devs_b[0])

    @jax.jit
    def denoise(lat, w):
        def body(i, x):
            return jnp.tanh(x @ w) + 0.1 * x
        return jax.lax.fori_loop(0, 50, body, lat)

    return image, esrgan_branch, lambda: denoise(lat, w), devs_b


def test_overlap_branches_outputs(branches):
    image, esrgan_branch, diffusion_branch, devs_b = branches
    esr, diff = overlap_branches(esrgan_branch, diffusion_branch)
    esr = np.asarray(esr)
    diff = jax.block_until_ready(diff)
    assert esr.shape == (128, 128, 3)
    # the ESRGAN stand-in is nearest x2: spot-check exactness
    np.testing.assert_array_equal(esr[::2, ::2], image)
    assert diff.shape == (1, 16, 16, 4)
    assert list(diff.devices())[0] == devs_b[0]  # stayed on its subset


def test_overlap_dispatch_is_nonblocking(branches):
    """overlap_branches must return before the ESRGAN branch finishes (the
    whole point): dispatching both takes far less time than executing both
    sequentially with a block in between."""
    _, esrgan_branch, diffusion_branch, _ = branches
    # warm compile
    jax.block_until_ready(overlap_branches(esrgan_branch,
                                           diffusion_branch)[0])
    jax.block_until_ready(diffusion_branch())

    t0 = time.perf_counter()
    esr, diff = overlap_branches(esrgan_branch, diffusion_branch)
    dispatch_s = time.perf_counter() - t0
    jax.block_until_ready(esr)
    jax.block_until_ready(diff)
    total_overlapped = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(esrgan_branch())
    jax.block_until_ready(diffusion_branch())
    total_sequential = time.perf_counter() - t0
    print(f"\noverlap note: dispatch {dispatch_s*1e3:.1f} ms, "
          f"overlapped {total_overlapped*1e3:.1f} ms, "
          f"sequential {total_sequential*1e3:.1f} ms")
    # Wall-clock assertions on shared CPUs are noise at these sizes; the
    # printed note records the measured delta. Sanity: dispatching both
    # branches is never slower than a full sequential execution plus margin.
    assert dispatch_s <= total_sequential * 1.5 + 0.05


def test_pipeline_overlap_flag():
    from neural_enhanced_super_resolution_tpu import SuperResolutionPipeline

    pipe = SuperResolutionPipeline(config={"use_esrgan": False,
                                           "use_diffusion": False,
                                           "segment_enhancement": False})
    assert pipe.config["stage_overlap"] is True
    assert pipe._overlap_active() is False  # no diffusion model loaded


class _SleepDiffusion:
    """Deterministic stand-in for the diffusion branch: its call occupies the
    branch for exactly ``seconds`` of wall-clock (host sleep — no CPU
    contention with the ESRGAN branch's XLA threads on shared runners) and
    returns the x4 output geometry of the real SD-x4 upscaler."""

    def __init__(self, seconds: float):
        self.seconds = seconds

    def to_device(self, device):
        return self

    def __call__(self, prompt, image, noise_level, num_inference_steps,
                 guidance_scale):
        time.sleep(self.seconds)
        img = np.asarray(image)
        return np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)


def test_stage_overlap_saves_wallclock(tmp_path, test_image):
    """VERDICT round 3 #5: stage_overlap must be a measured wall-clock win,
    not a placement claim. With a sleep-padded diffusion branch, overlapped
    enhance_array must save at least half of min(esrgan_time, sleep) vs the
    sequential (stage_overlap=False) run."""
    from tests.test_pipeline import TINY_ARCH, tiny_ckpt  # noqa: F401
    from tests.test_pipeline import _mk_pipeline

    sleep_s = 2.5  # >> scheduler noise on a loaded 1-core CI host
    img = np.asarray(test_image[:128, :128])

    def make(overlap, use_diffusion=True):
        ckpt = make.ckpt
        pipe = _mk_pipeline(tmp_path, ckpt, use_diffusion=use_diffusion,
                            stage_overlap=overlap, data_parallel="auto",
                            adaptive_sharpening=False, enable_tiling=True,
                            max_megapixels=0.001, max_tile_size=48,
                            tile_halo=8)
        if use_diffusion:
            pipe.models["diffusion"] = _SleepDiffusion(sleep_s)
        return pipe

    # build the tiny checkpoint once via the module fixture machinery
    import tests.test_pipeline as tp
    import pytest as _pytest

    class _Factory:
        def mktemp(self, name):
            d = tmp_path / name
            d.mkdir(exist_ok=True)
            return d

    make.ckpt = tp.tiny_ckpt.__wrapped__(_Factory())

    def timed(pipe):
        pipe.enhance_array(img)  # warm (compiles)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.enhance_array(img)
            best = min(best, time.perf_counter() - t0)
        return best

    t_esr = timed(make(False, use_diffusion=False))   # ESRGAN branch alone
    t_seq = timed(make(False))                        # blocked between stages
    t_ovl = timed(make(True))                         # dispatch left in flight

    saving = t_seq - t_ovl
    expected = min(t_esr, sleep_s)
    print(f"\noverlap wall-clock: esrgan-only {t_esr:.2f}s, "
          f"sequential {t_seq:.2f}s, overlapped {t_ovl:.2f}s, "
          f"saving {saving:.2f}s (expected ~{expected:.2f}s)")
    assert t_seq >= sleep_s  # the sleep really was on the critical path
    # Overlap must hide a meaningful share of the smaller branch. The 0.4
    # factor tolerates scheduler noise on loaded 1-core CI hosts (the ESRGAN
    # branch timing jitters, the 2.5 s sleep does not).
    assert saving >= 0.4 * expected, (
        f"stage overlap saved {saving:.2f}s < 40% of {expected:.2f}s")
