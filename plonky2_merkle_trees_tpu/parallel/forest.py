"""Sharded Merkle-forest build — the multi-chip scaling primitive.

The reference is single-threaded host Rust (SURVEY.md §2.3: no parallel code
anywhere); the TPU-native design shards the LEAF axis across a device mesh.
Each device builds its local perfect subtree entirely on-chip (one batched
Poseidon launch per level), the per-device roots ride one tiny ``all_gather``
over ICI, and the (replicated) top tree is log2(n_devices) more hashes.

For a power-of-two device count the result is bit-identical to the
single-chip ``MerkleTree.build`` root over the same leaves; for other device
counts ``forest_peaks`` + MMR-style bagging is offered instead (peaks of an
MMR are exactly a sharded forest's roots, merkle_mountain_ranges.rs:179-200).
"""

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import poseidon
from .mesh import SHARD_AXIS, default_mesh


def _local_tree_root(leaves):
    level = poseidon.hash_leaves(leaves)
    while level.shape[0] > 1:
        pairs = level.reshape(-1, 2, 4)
        level = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
    return level[0]


def _binary_reduce(roots):
    level = roots
    while level.shape[0] > 1:
        pairs = level.reshape(-1, 2, 4)
        level = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
    return level[0]


def _forest_root_shard_fn(leaves_local):
    root = _local_tree_root(leaves_local)
    roots = jax.lax.all_gather(root, SHARD_AXIS)      # (n_dev, 4) — ICI collective
    return _binary_reduce(roots)


def _forest_peaks_shard_fn(leaves_local):
    return _local_tree_root(leaves_local)[None, :]


def forest_root(leaves, mesh=None):
    """Merkle root of a power-of-two leaf vector sharded over the mesh.

    Bit-identical to MerkleTree.build(leaves).root when n_devices is a power
    of two and shards are equal powers of two.
    """
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    if n_dev & (n_dev - 1):
        raise ValueError("forest_root needs a power-of-two device count; "
                         "use forest_peaks + bagging otherwise")
    fn = jax.shard_map(_forest_root_shard_fn, mesh=mesh,
                       in_specs=P(SHARD_AXIS), out_specs=P(), check_vma=False)
    leaves = jax.device_put(leaves, NamedSharding(mesh, P(SHARD_AXIS)))
    return jax.jit(fn)(leaves)


def forest_peaks(leaves, mesh=None):
    """Per-shard subtree roots ("peaks"), one per device: (n_dev, 4)."""
    mesh = mesh or default_mesh()
    fn = jax.shard_map(_forest_peaks_shard_fn, mesh=mesh,
                       in_specs=P(SHARD_AXIS), out_specs=P(SHARD_AXIS))
    leaves = jax.device_put(leaves, NamedSharding(mesh, P(SHARD_AXIS)))
    return jax.jit(fn)(leaves)


@partial(jax.jit, static_argnames=("mesh_holder",))
def _noop(x, mesh_holder=None):
    return x


def sharded_forest_step(mesh):
    """Return a jitted full 'step' over ``mesh``: sharded leaf hashing, local
    tree reduction, cross-device root reduction.  This is the framework's
    multi-chip workload analog of a training step (data-parallel over the
    leaf axis + collective reduction), used by __graft_entry__.dryrun_multichip."""
    fn = jax.shard_map(_forest_root_shard_fn, mesh=mesh,
                       in_specs=P(SHARD_AXIS), out_specs=P(), check_vma=False)
    return jax.jit(fn)
