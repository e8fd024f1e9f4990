"""Benchmark: batched Poseidon two_to_one throughput on one chip.

Prints ONE JSON line. The reference publishes no numbers (BASELINE.md);
``vs_baseline`` is computed against a fixed single-thread CPU anchor of
600k Poseidon hashes/s — the ballpark of plonky2 0.1.3's scalar Rust hasher
on one modern core, i.e. what a user of the reference actually gets today.
"""

import json
import time

import numpy as np

import plonky2_merkle_trees_tpu as pmt
import jax
import jax.numpy as jnp

BASELINE_CPU_HASHES_PER_SEC = 600_000.0


def main():
    from plonky2_merkle_trees_tpu.ops.poseidon_pallas import two_to_one_pallas

    n = 1 << 20
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, pmt.field.P, size=(n, 4), dtype=np.uint64))
    right = jnp.asarray(rng.integers(0, pmt.field.P, size=(n, 4), dtype=np.uint64))

    # Warm-up / compile.
    np.asarray(two_to_one_pallas(left, right)[0])

    # Chain iterations through a data dependency and force completion with a
    # device->host fetch: block_until_ready alone under-reports through the
    # remote-TPU tunnel.
    iters = 5
    start = time.perf_counter()
    out = right
    for _ in range(iters):
        out = two_to_one_pallas(left, out)
    _ = np.asarray(out[0])
    elapsed = time.perf_counter() - start

    hashes_per_sec = n * iters / elapsed
    print(json.dumps({
        "metric": "poseidon_two_to_one_hashes_per_sec",
        "value": round(hashes_per_sec, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_sec / BASELINE_CPU_HASHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
