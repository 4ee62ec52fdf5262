"""Multi-host (DCN) initialisation and hybrid meshes (SURVEY.md §2c comm row).

The reference is strictly single-process (its only "comm backend" is Qt
signals — /root/reference/nesr/gui/app.py:75-78). The TPU-native framework
scales past one host the JAX way: ``jax.distributed`` over DCN for process
coordination, and a hybrid mesh whose outer axis spans hosts (data/ensemble
parallel — tile batches are embarrassingly parallel, so only DCN-cheap
collectives cross hosts) while inner axes stay on ICI (strip halos, TP).

Usage on a multi-host pod slice:

    from neural_enhanced_super_resolution_tpu.runtime import distributed
    distributed.init_multihost()            # no-op on single host
    mesh = distributed.make_hybrid_mesh(ici_axes={"dp": 4})
    # -> Mesh with axes ("dcn", "dp"); shard tile batches P(("dcn", "dp"))

Environment contract (standard JAX names are honoured first):
  * JAX_COORDINATOR_ADDRESS / NESR_COORDINATOR_ADDRESS — "host:port" of
    process 0. If neither is set and no managed-cluster autodetection
    applies, init is a no-op (single host).
  * JAX_NUM_PROCESSES / NESR_NUM_PROCESSES, JAX_PROCESS_ID /
    NESR_PROCESS_ID — optional overrides; TPU pods autodetect.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh

logger = logging.getLogger("nesr.distributed")

__all__ = ["init_multihost", "is_initialized", "make_hybrid_mesh",
           "local_tile_slice"]

_initialized = False


def _env(*names: str) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def is_initialized() -> bool:
    return _initialized


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialise jax.distributed for a multi-host run; no-op on one host.

    Returns True when a multi-host runtime was (or already is) initialised.
    Safe to call unconditionally at pipeline start: without a coordinator
    address (explicit or from env/cluster autodetection) it does nothing.
    """
    global _initialized
    if _initialized:
        return True
    coord = coordinator_address or _env("JAX_COORDINATOR_ADDRESS",
                                        "NESR_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else _env(
        "JAX_NUM_PROCESSES", "NESR_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env(
        "JAX_PROCESS_ID", "NESR_PROCESS_ID")
    if coord is None and nproc is None:
        # On managed TPU pods jax.distributed.initialize() autodetects; only
        # attempt it when the platform says we're on TPU with pod metadata.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or \
                os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
            except Exception as e:  # noqa: BLE001 — ladder: stay single-host
                # RuntimeError: backend already initialised (e.g. a
                # single-host session in a pod-flavoured environment).
                # Anything else (ValueError from malformed cluster metadata,
                # connection errors) must ALSO degrade to single-host rather
                # than break SuperResolutionPipeline.__init__ — the explicit
                # coordinator path below already does (ADVICE round 2).
                logger.debug("multi-host autodetection skipped: %s", e)
                return False
            _initialized = True
            logger.info("jax.distributed autodetected pod: %d processes",
                        jax.process_count())
            return True
        return False
    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # noqa: BLE001 — ladder: degrade to single-host
        # E.g. a stale JAX_NUM_PROCESSES without a coordinator address, or a
        # backend initialised before us. Pipeline construction must survive
        # (graceful-degradation ladder), so log loudly and stay single-host.
        logger.error("jax.distributed.initialize(%s) failed; continuing "
                     "single-host: %s", kwargs, e)
        return False
    _initialized = True
    logger.info("jax.distributed initialised: process %d/%d, %d local + %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def make_hybrid_mesh(ici_axes: dict[str, int] | None = None,
                     dcn_axis: str = "dcn") -> Mesh:
    """Mesh with a host-spanning outer axis and ICI-local inner axes.

    ``ici_axes`` maps inner axis names to sizes (product must equal the local
    device count; defaults to one axis "dp" = all local devices). The outer
    ``dcn_axis`` has size jax.process_count() — 1 on a single host, so the
    same mesh code runs unchanged everywhere. Inner-axis device order follows
    the physical ICI topology via mesh_utils.create_hybrid_device_mesh, so
    inner-axis collectives (halo ppermute, TP psum) traverse neighbour ICI
    links on 2D/3D torus slices (ADVICE round 2: a plain (process, id) sort
    is correct but can route rings over non-neighbour links). Falls back to
    process-major id order on backends without topology info.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if ici_axes is None:
        ici_axes = {"dp": n_local}
    sizes = list(ici_axes.values())
    if int(np.prod(sizes)) != n_local:
        raise ValueError(
            f"ici_axes {ici_axes} product != local device count {n_local}")
    try:
        from jax.experimental import mesh_utils
        # Same-rank shapes that multiply elementwise to the global mesh:
        # the dcn factor lives on the leading axis, ici factors on the rest.
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, *sizes), (n_proc,) + (1,) * len(sizes),
            devices=jax.devices())
        arr = arr.reshape((n_proc, *sizes))
    except Exception as e:  # noqa: BLE001 — CPU meshes / old jax versions
        logger.debug("create_hybrid_device_mesh unavailable (%s); "
                     "using process-major id order", e)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.array(devs).reshape((n_proc, *sizes))
    return Mesh(arr, (dcn_axis, *ici_axes.keys()))


def local_tile_slice(n_tiles: int) -> slice:
    """Which slice of a global tile batch this process should stage.

    Host-side helper for multi-host batch serving: tiles are staged only by
    the process that owns them (jax.make_array_from_process_local_data
    assembles the global array), keeping HBM staging traffic host-local.
    Balanced floor/ceil split: the first ``n_tiles % n_proc`` processes get
    one extra tile, so no process is left idle when the count does not
    divide (e.g. 10 tiles / 4 procs -> 3/3/2/2, not 3/3/3/1).
    """
    n_proc = jax.process_count()
    idx = jax.process_index()
    base, extra = divmod(n_tiles, n_proc)
    start = idx * base + min(idx, extra)
    return slice(start, start + base + (1 if idx < extra else 0))
