"""Stage-level pipeline parallelism: ESRGAN and diffusion branches run
concurrently on disjoint device subsets.

The reference runs the two model branches sequentially inside each iteration
(/root/reference/nesr/nesr.py:552-584). They are data-independent (both
consume the segmented image, their outputs meet only at the ensemble), so on
a multi-chip mesh they can execute simultaneously: ESRGAN's tile batch is
data-parallel over one subset of the mesh while the diffusion denoise loop
owns the remaining chips. JAX's single-controller async dispatch does the
overlap for free — both computations are enqueued before either result is
consumed, and they target disjoint devices so the runtime executes them
concurrently (SURVEY.md §2c PP row).

On a single device the same code degenerates gracefully: dispatch is still
asynchronous, but execution serialises on the one chip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["split_mesh", "overlap_branches"]


def split_mesh(devices=None, diffusion_share: float = 0.25
               ) -> tuple[Mesh, list]:
    """Split the device list into (esrgan tile-DP mesh, diffusion devices).

    The diffusion branch is one jitted program (no tile batch to shard), so
    it gets a small subset — by default 1/4 of the chips, at least one.
    With a single device both branches share it.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) == 1:
        return Mesh(np.array(devices), ("dp",)), devices
    k = max(1, int(len(devices) * diffusion_share))
    esr = devices[:-k] or devices[:1]
    return Mesh(np.array(esr), ("dp",)), devices[-k:]


def overlap_branches(esrgan_branch, diffusion_branch):
    """Dispatch both branches, then return both results.

    Both callables must ENQUEUE device work and return device arrays (or
    anything lazy) without blocking; this function calls them back-to-back so
    the second branch is in flight before anyone waits on the first. The
    caller materialises the results (ensemble / np.asarray) afterwards.
    """
    esrgan_out = esrgan_branch()
    diffusion_out = diffusion_branch() if diffusion_branch is not None \
        else None
    return esrgan_out, diffusion_out
