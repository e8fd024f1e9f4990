"""Device-mesh helpers.

The scaling dimension of this framework is the LEAF axis (SURVEY.md §5):
independent subtrees shard perfectly across chips ("Merkle forest"), with a
tiny replicated reduction over shard roots — peaks of an MMR are exactly this
structure.  A 1-D mesh over all devices is therefore the default; the NTT
additionally uses the same axis for its transpose exchange.
"""

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def make_mesh(n_devices: int = None, axis_name: str = SHARD_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def default_mesh() -> Mesh:
    return make_mesh()


def _mk_constrainer(mesh):
    """Returns (c, r): c(x, dim) pins dimension ``dim`` of x sharded over
    the mesh via with_sharding_constraint (no-op when the dim is smaller
    than the device count, or mesh is None); r(x) pins x replicated.

    This pair is how the SPMD prover expresses its layout plan: annotate
    the natural axis per stage (polynomial axis for batched NTTs, leaf/
    domain axis for hashing and constraint evaluation) and let XLA's
    partitioner insert the collectives at the boundaries."""
    if mesh is None:
        return (lambda x, dim: x), (lambda x: x)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)

    def c(x, dim):
        if int(x.shape[dim]) < ndev:
            return x
        spec = [None] * x.ndim
        spec[dim] = axis
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec)))

    def r(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec()))

    return c, r
