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
