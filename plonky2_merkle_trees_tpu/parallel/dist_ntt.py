"""Distributed radix NTT over a device mesh (four-step / transpose method).

Global size N = N1 * N2 with N1 = n_devices.  Viewing the coefficient vector
as a row-major (N1, N2) matrix, sharding the COLUMN axis gives:

  1. local size-N1 NTTs down the rows (each device owns whole columns),
  2. local twiddle multiply w_N^(n2 * k1),
  3. one all-to-all transpose over ICI (the only communication),
  4. local size-N2 NTTs along the rows,

and the natural-order result is the transposed matrix.  This is exactly the
"butterfly stages exchanged all-to-all over ICI" design the north star
prescribes (BASELINE.json; SURVEY.md §2.3 SP row) — the reference has no
distributed code at all.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import field
from ..plonk import ntt as nttmod
from .mesh import SHARD_AXIS, default_mesh


def _twiddle_block(n_log: int, n1: int, n2: int, col_start: int, cols: int) -> np.ndarray:
    """w_N^(n2 * k1) for k1 < n1 (rows), n2 in [col_start, col_start+cols)."""
    w = field.primitive_root_of_unity(n_log)
    out = np.empty((n1, cols), dtype=np.uint64)
    for j in range(cols):
        n2_idx = col_start + j
        base = pow(w, n2_idx, field.P)
        acc = 1
        for k1 in range(n1):
            out[k1, j] = acc
            acc = acc * base % field.P
    return out


def dist_ntt(values, mesh=None):
    """NTT of a (N,) uint64 vector sharded over the mesh; returns the
    natural-order result (replicated gather at the end for convenience).
    Bit-identical to plonk.ntt.ntt."""
    mesh = mesh or default_mesh()
    n_dev = int(mesh.devices.size)
    n = int(values.shape[0])
    n_log = n.bit_length() - 1
    if (1 << n_log) != n:
        raise ValueError("size must be a power of two")
    n1, n2 = n_dev, n // n_dev
    if n1 & (n1 - 1):
        raise ValueError("device count must be a power of two")

    # Row-major matrix, columns sharded.
    mat = jnp.asarray(values).reshape(n1, n2)
    mat = jax.device_put(mat, NamedSharding(mesh, P(None, SHARD_AXIS)))
    cols = n2 // n_dev

    def shard_fn(block):
        # block: (n1, cols) — whole columns of the matrix
        d = jax.lax.axis_index(SHARD_AXIS)
        # 1. size-N1 NTT down each column (vectorised over columns)
        y = nttmod.ntt(block.T).T                      # (n1, cols)
        # 2. twiddles w^(n2*k1): per-device block selected by axis index
        tw_all = jnp.asarray(np.stack([
            _twiddle_block(n_log, n1, n2, dd * cols, cols)
            for dd in range(n_dev)]))                  # (D, n1, cols)
        y = field.mul(y, tw_all[d])
        # 3. all-to-all transpose: (n1, cols) -> rows of the transposed matrix
        #    split rows (axis 0) across devices, concat column chunks (axis 1)
        z = jax.lax.all_to_all(y, SHARD_AXIS, split_axis=0, concat_axis=1,
                               tiled=True)             # (n1/D, n2)
        # 4. size-N2 NTT along each remaining row
        z = nttmod.ntt(z)                              # (n1/D, n2)
        return z

    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(None, SHARD_AXIS),
        out_specs=P(SHARD_AXIS, None), check_vma=False))(mat)
    # out is the (n1, n2) matrix Z with Z[k1, k2] = X[k1 + n1*k2]:
    # natural order = Z.T flattened.
    return jnp.transpose(out).reshape(-1)
