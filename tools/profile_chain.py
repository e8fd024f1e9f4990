"""Per-level timing of the uniform recursion chain (reference example2,
merkle_proof_example2.rs:124-192 — the repo's most expensive flow).

Splits each chain level into its host phases (witness-target setting,
witness VM, device dispatch, host tail) so the gap between the flagship's
0.465 s single prove and the chain's per-level cost is attributable.

Run WITHOUT the test conftest so jax sees the accelerator:
    python tools/profile_chain.py [depth]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import plonky2_merkle_trees_tpu as pmt  # noqa: F401
from plonky2_merkle_trees_tpu import MerkleTree, field
from plonky2_merkle_trees_tpu.circuits.merkle_recursion import (
    uniform_chain_circuits, verify_merkle_proof_chain_uniform)
from plonky2_merkle_trees_tpu.plonk.witness import PartialWitness


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(5)
    leaves = [int(v) for v in rng.integers(0, field.P, size=1 << depth,
                                           dtype=np.uint64)]
    tree = MerkleTree.build(leaves)
    idx = 5 % (1 << depth)
    proof_path = tree.get_merkle_proof(idx)
    in_between = tree.get_in_between_hashes(idx)

    t0 = time.perf_counter()
    bundle = uniform_chain_circuits()
    print(f"uniform circuits build: {time.perf_counter()-t0:.2f}s "
          f"degree=2^{bundle['degree_bits']}")

    def run_chain(label):
        t0 = time.perf_counter()
        data, proof = verify_merkle_proof_chain_uniform(
            idx, tree.tree[0][idx], proof_path, in_between)
        total = time.perf_counter() - t0
        data.verify(proof)
        print(f"{label}: chain depth={depth} total={total:.3f}s "
              f"({total/depth:.3f}s/level)")
        return data, proof

    run_chain("cold")
    run_chain("warm1")
    data, proof = run_chain("warm2")

    # per-phase breakdown of ONE uniform step, warm
    init_data, init_targets = bundle["init"]
    pw = PartialWitness()
    pw.set_hash_target(init_targets[0], tree.tree[0][idx])
    pw.set_hash_target(init_targets[1], proof_path[0])
    for t, v in zip(init_data.prover_only.public_inputs, in_between[0]):
        pw.set_target(t, int(v))
    t0 = time.perf_counter()
    prev_proof = init_data.prove(pw)
    print(f"init prove (host, device grind): {time.perf_counter()-t0:.3f}s")

    sdata, proof_t, vdata_t, sibling_t, side_t = bundle["step1"]
    t0 = time.perf_counter()
    spw = PartialWitness()
    spw.set_hash_target(sibling_t, proof_path[1])
    spw.set_bool_target(side_t, (idx // 2) % 2 == 0)
    spw.set_proof_with_pis_target(proof_t, prev_proof)
    spw.set_verifier_data_target(vdata_t, init_data.verifier_only)
    for t, v in zip(sdata.prover_only.public_inputs, in_between[1]):
        spw.set_target(t, int(v))
    t1 = time.perf_counter()
    print(f"step witness-target setting: {t1-t0:.3f}s "
          f"({len(spw.values)} targets)")
    p = sdata.prove(spw)
    t2 = time.perf_counter()
    print(f"step prove: {t2-t1:.3f}s  (PMT_DEVICE_TRACE=1 for phases)")
    sdata.verify(p)


if __name__ == "__main__":
    main()
