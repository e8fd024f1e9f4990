"""Multi-host runtime: process bootstrap + process-aware meshes.

A TPU pod slice runs one process per host, each seeing only its local
chips; ``jax.distributed.initialize`` joins them into one runtime whose
``jax.devices()`` is the GLOBAL device list, and every jitted SPMD program
(the sharded prover, the forest, the distributed NTT) then spans hosts with
the same code — collectives ride ICI within a slice, DCN across slices,
chosen by XLA from the mesh layout (SURVEY.md §2.3 comm-backend row; the
reference is single-threaded single-host Rust).

This module is deliberately thin: JAX's runtime owns discovery and
transport; the framework only needs a deterministic bootstrap order and
meshes built from the global device list.  ``tools/multihost_demo.py``
runs the 2-process CPU flavor end to end (no TPU pod needed) and is
exercised by tests/test_multihost.py.
"""

import os
from dataclasses import dataclass

import numpy as np

from .mesh import SHARD_AXIS


@dataclass(frozen=True)
class ProcessInfo:
    process_id: int
    num_processes: int
    local_devices: int
    global_devices: int


def init_distributed(coordinator_address: str = None,
                     num_processes: int = None,
                     process_id: int = None) -> ProcessInfo:
    """Join (or bootstrap) the multi-process runtime.

    Arguments fall back to the conventional environment variables
    (PMT_COORDINATOR / PMT_NUM_PROCESSES / PMT_PROCESS_ID) so a launcher
    can configure workers purely through the environment; with none set
    and a single process this is a no-op that still returns ProcessInfo.
    Call BEFORE any other jax API touches the backend.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("PMT_COORDINATOR")
    if num_processes is None and "PMT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PMT_NUM_PROCESSES"])
    if process_id is None and "PMT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PMT_PROCESS_ID"])

    if coordinator_address is not None and (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)

    return ProcessInfo(
        process_id=jax.process_index(),
        num_processes=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def global_mesh(axis_name: str = SHARD_AXIS):
    """1-D mesh over the GLOBAL device list (all processes).  Under a
    multi-process runtime, arrays sharded over this mesh are addressable
    only shard-wise per process — build global inputs with
    ``make_global_array`` and fetch replicated outputs directly."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis_name,))


def make_global_array(local_values, mesh=None, axis_name: str = SHARD_AXIS):
    """Assemble a globally-sharded array from each process's LOCAL shard
    (leaf-axis concatenation in process order) — the multi-host twin of
    ``jax.device_put(x, NamedSharding(mesh, P(SHARD_AXIS)))``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = mesh or global_mesh(axis_name)
    sharding = NamedSharding(mesh, P(axis_name))
    local_values = np.asarray(local_values)
    global_shape = (local_values.shape[0] * jax.process_count(),) \
        + local_values.shape[1:]
    n_local = len(jax.local_devices())
    per_dev = local_values.shape[0] // n_local
    local_arrays = [
        jax.device_put(local_values[i * per_dev:(i + 1) * per_dev], d)
        for i, d in enumerate(jax.local_devices())
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, local_arrays)
