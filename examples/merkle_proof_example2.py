"""Layer-per-proof recursive Merkle verification — parity twin of the
reference's examples/merkle_proof_example2.rs (test-driven there; the chain
is verify_merkle_proof_circuit_and_proof, reference :124-192): one FULL
plonky2-style prove per tree level, each circuit verifying the previous
level's proof in-circuit.

Uses the lighter test config (like tests/test_recursion.py) so the demo
stays minutes, not hours, on a single weak host core; pass
CircuitConfig.standard_recursion_config() for the production parameters.
See docs/recursion_walkthrough.md for the line-by-line tutorial.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import plonky2_merkle_trees_tpu as pmt
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.circuits import (
    verify_merkle_proof_circuit_and_proof, verify_merkle_proof_chain_uniform)
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig


def main():
    rng = np.random.default_rng(0)
    nr_leaves, index = 8, 5
    leaves = [int(x) for x in rng.integers(0, field.P, nr_leaves, dtype=np.uint64)]
    tree = pmt.MerkleTree.build(leaves)
    merkle_proof = tree.get_merkle_proof(index)
    in_between = tree.get_in_between_hashes(index)

    final_data, final_proof = verify_merkle_proof_circuit_and_proof(
        index, tree.tree[0][index], merkle_proof, in_between,
        config=CircuitConfig.test_config())
    final_data.verify(final_proof)
    print("chained", len(merkle_proof), "recursive proofs; root public inputs:",
          [int(v) for v in final_proof.public_inputs])

    # The shape-stable variant proves the SAME statement chain but reuses
    # one compiled circuit for every level >= 2 (three shapes total for any
    # depth) — the form that scales on an accelerator, where each new
    # circuit shape costs a compile.
    u_data, u_proof = verify_merkle_proof_chain_uniform(
        index, tree.tree[0][index], merkle_proof, in_between,
        config=CircuitConfig.test_config())
    u_data.verify(u_proof)
    assert [int(v) for v in u_proof.public_inputs] == \
        [int(v) for v in final_proof.public_inputs]
    print("uniform chain reaches the same root with 3 circuit shapes")


if __name__ == "__main__":
    main()
