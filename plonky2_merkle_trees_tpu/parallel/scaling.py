"""Scaling-efficiency harness: hashing throughput at 1..D devices.

Produces the report the north star demands (>= 80% linear scaling of
hashes/sec from 1 to N devices) by building the same sharded Merkle forest
over growing sub-meshes.  On the CI CPU mesh this exercises the code path;
real numbers come from TPU pod slices.
"""

import time
from typing import List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import field
from .forest import _forest_peaks_shard_fn
from .mesh import SHARD_AXIS, make_mesh


def scaling_report(log_leaves_per_device: int = 14, device_counts: List[int] = None,
                   iters: int = 3) -> List[dict]:
    """Weak-scaling run: fixed leaves/device, growing device count."""
    if device_counts is None:
        device_counts = []
        d = 1
        while d <= jax.device_count():
            device_counts.append(d)
            d *= 2
    rng = np.random.default_rng(0)
    rows = []
    for n_dev in device_counts:
        mesh = make_mesh(n_dev)
        n = n_dev << log_leaves_per_device
        leaves = rng.integers(0, field.P, size=n, dtype=np.uint64)
        fn = jax.jit(jax.shard_map(_forest_peaks_shard_fn, mesh=mesh,
                                   in_specs=P(SHARD_AXIS), out_specs=P(SHARD_AXIS),
                                   check_vma=False))
        x = jax.device_put(jnp.asarray(leaves), NamedSharding(mesh, P(SHARD_AXIS)))
        np.asarray(fn(x))  # warm-up/compile
        start = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(x)
        _ = np.asarray(out)
        elapsed = time.perf_counter() - start
        hashes = (n - n_dev) * iters  # two_to_one per internal node per shard
        rows.append({"devices": n_dev, "leaves": n,
                     "hashes_per_sec": hashes / elapsed,
                     "seconds": elapsed / iters})
    base = rows[0]["hashes_per_sec"] if rows else 1.0
    for r in rows:
        r["scaling_efficiency"] = r["hashes_per_sec"] / (base * r["devices"])
    return rows
