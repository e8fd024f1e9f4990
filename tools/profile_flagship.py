"""Flagship timing: 1-layer recursive MMR verification (SURVEY.md §3.4,
reference mmr_plonky2_verifier_1_recursion.rs:152-221) on the real device.

Builds the inner Merkle-walk circuit, proves it, builds the outer circuit
embedding the in-circuit FRI verifier, then times several outer proves
(first = cold XLA/executable loads, rest = warm serving latency).

Run WITHOUT the test conftest so jax sees the accelerator:
    python tools/profile_flagship.py [n_warm]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import plonky2_merkle_trees_tpu  # noqa: F401
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.mmr import MMR
from plonky2_merkle_trees_tpu.circuits.mmr_recursion import (
    verify_inner_merkle_proof_circuit,
    complete_verification_circuit_with_inner_proof,
)
from plonky2_merkle_trees_tpu.plonk.witness import PartialWitness


def main():
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(7)
    leaves = rng.integers(0, field.P, size=11, dtype=np.uint64)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(3)
    root = mmr.bagging_the_peaks()

    t0 = time.perf_counter()
    inner, leaf_t, proof_ts = verify_inner_merkle_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks))
    print(f"inner build: {time.perf_counter()-t0:.2f}s degree=2^{inner.common.degree_bits}")

    pw1 = PartialWitness()
    pw1.set_target(leaf_t, int(leaves[3]))
    for (ht, bt), (h, b) in zip(proof_ts, pr.merkle_proof):
        pw1.set_hash_target(ht, h)
        pw1.set_bool_target(bt, b)
    for t, v in zip(inner.prover_only.public_inputs,
                    [e for p in pr.peaks for e in p]):
        pw1.set_target(t, int(v))

    t0 = time.perf_counter()
    inner_proof = inner.prove(pw1)
    print(f"inner prove: {time.perf_counter()-t0:.2f}s")
    inner.verify(inner_proof)

    t0 = time.perf_counter()
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(pr.peaks))
    print(f"outer build: {time.perf_counter()-t0:.2f}s degree=2^{outer.common.degree_bits}")

    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for ts, peak in zip(peak_ts, pr.peaks):
        pw2.set_hash_target(ts, peak)
    for t, v in zip(outer.prover_only.public_inputs, root):
        pw2.set_target(t, int(v))

    t0 = time.perf_counter()
    final = outer.prove(pw2)
    print(f"outer prove (cold): {time.perf_counter()-t0:.2f}s")
    outer.verify(final)

    times = []
    for i in range(n_warm):
        t0 = time.perf_counter()
        final = outer.prove(pw2)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"outer prove (warm {i+1}): {dt:.2f}s")
    outer.verify(final)
    print(f"warm best: {min(times):.2f}s")


if __name__ == "__main__":
    main()
