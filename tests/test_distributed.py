"""Multi-host (DCN) runtime helpers, exercised single-process on the CPU mesh.

True multi-process DCN cannot run inside one pytest process; what these tests
pin down is the host-facing contract: env handling (no-op without a
coordinator), hybrid-mesh axis layout (outer host axis x inner ICI axes), and
the local tile-slice arithmetic used by multi-host batch staging.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from neural_enhanced_super_resolution_tpu.runtime import distributed


def test_init_is_noop_without_coordinator(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "NESR_COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "NESR_NUM_PROCESSES",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.init_multihost() is False
    assert distributed.is_initialized() is False


def test_hybrid_mesh_axes_single_host():
    mesh = distributed.make_hybrid_mesh(ici_axes={"dp": 4, "tp": 2})
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.devices.shape == (1, 4, 2)

    # A tile batch sharded over (dcn, dp) runs: inner collectives stay on the
    # ici axes; with one host the dcn axis is size 1 and the program is
    # identical to the single-host one.
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P(("dcn", "dp"), None)))
    y = jax.jit(lambda a: a * 2 + 1)(xs)
    assert np.allclose(np.asarray(y), np.asarray(x) * 2 + 1)


def test_hybrid_mesh_rejects_bad_ici_product():
    with pytest.raises(ValueError):
        distributed.make_hybrid_mesh(ici_axes={"dp": 3})


def test_local_tile_slice_single_process():
    s = distributed.local_tile_slice(10)
    assert (s.start, s.stop) == (0, 10)


def test_local_tile_slice_arithmetic(monkeypatch):
    # Simulate 4 processes: every tile is owned by exactly one process and
    # coverage is complete and in order.
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    owned, sizes = [], []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        s = distributed.local_tile_slice(10)
        owned.extend(range(s.start, s.stop))
        sizes.append(s.stop - s.start)
    assert owned == list(range(10))
    # balanced floor/ceil split: no idle process, max skew 1
    assert sizes == [3, 3, 2, 2]
