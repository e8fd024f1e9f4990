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


class CrossHostDivergence(RuntimeError):
    """Raised when processes of a multi-host run disagree on a value that
    determinism guarantees must be identical everywhere (a root, a proof
    transcript, a challenge).  Carries enough detail to identify the
    faulty host(s) — the fail-fast behavior SURVEY.md §5 calls for (the
    reference is single-threaded and has no analog)."""

    def __init__(self, label: str, digests: np.ndarray):
        self.label = label
        self.digests = digests
        rows = {}
        for pid, d in enumerate(digests):
            rows.setdefault(tuple(int(v) for v in d), []).append(pid)
        groups = sorted(rows.items(), key=lambda kv: -len(kv[1]))
        majority = groups[0][1]
        minority = [pid for _, pids in groups[1:] for pid in pids]
        self.minority_processes = sorted(minority)
        super().__init__(
            f"cross-host divergence on '{label}': "
            f"{len(rows)} distinct digests across {len(digests)} processes; "
            f"majority={majority}, diverging={sorted(minority)} "
            f"(digest rows: {rows})")


def _host_digest(value) -> np.ndarray:
    """Cheap deterministic fingerprint of an arbitrary array: fold every
    u64 word into 8 Goldilocks lane-sums (position-weighted so permuted
    data does not collide), then one Poseidon hash."""
    from .. import field, poseidon
    flat = np.ascontiguousarray(np.asarray(value)).reshape(-1)
    flat = flat.view(np.uint8)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    words = flat.view(np.uint64) % np.uint64(field.P)
    lanes = 8
    wpad = (-len(words)) % lanes
    if wpad:
        words = np.concatenate([words, np.zeros(wpad, dtype=np.uint64)])
    cols = words.reshape(-1, lanes)
    # weight row r by (r+1) mod p so reorderings change the digest
    weights = np.arange(1, cols.shape[0] + 1,
                        dtype=np.uint64) % np.uint64(field.P)
    acc = []
    with np.errstate(over="ignore"):
        prods = field.mul(cols, weights[:, None])      # canonical u64
    for j in range(lanes):
        col = prods[:, j]
        lo = int((col & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
        hi = int((col >> np.uint64(32)).sum(dtype=np.uint64))
        acc.append((lo + (hi << 32)) % field.P)
    return poseidon.hash_no_pad_scalar(acc + [int(cols.shape[0])])


def check_cross_host_agreement(value, label: str = "value") -> np.ndarray:
    """Fail-fast determinism check: every process digests ``value``
    locally, the digests are all-gathered over the process group, and any
    mismatch raises :class:`CrossHostDivergence` naming the diverging
    process ids.  Returns the (num_processes, 4) digest table on success.

    Single-process: a local no-op (the table has one row).  Use after any
    collectively-computed result that must be replicated (forest roots,
    bagged peaks, proof transcripts):

        root = forest_root(...)
        runtime.check_cross_host_agreement(root, "forest root")
    """
    import jax
    digest = _host_digest(value).astype(np.uint64)
    if jax.process_count() == 1:
        return digest[None, :]
    from jax.experimental import multihost_utils
    table = np.asarray(multihost_utils.process_allgather(digest))
    table = table.reshape(jax.process_count(), 4)
    if not (table == table[0]).all():
        raise CrossHostDivergence(label, table)
    return table
