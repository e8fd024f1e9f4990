"""General index-parameterized Merkle-proof circuit — parity twin of the
reference's examples/merkle_proof_example1.rs (which has no main; its test
module drives verify_merkle_proof_circuit, reference :9-64).

The sibling sides are BAKED into the circuit from the leaf index (a
different index means a different circuit); the root is the only public
input.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import plonky2_merkle_trees_tpu as pmt
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.circuits import verify_merkle_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness


def main():
    rng = np.random.default_rng(0)
    nr_leaves, index = 16, 5
    leaves = [int(x) for x in rng.integers(0, field.P, nr_leaves, dtype=np.uint64)]
    tree = pmt.MerkleTree.build(leaves)
    merkle_proof = tree.get_merkle_proof(index)

    data, targets = verify_merkle_proof_circuit(index, 4)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], tree.tree[0][index])
    for ht, h in zip(targets[1:], merkle_proof):
        pw.set_hash_target(ht, h)
    for t, v in zip(data.prover_only.public_inputs, tree.root):
        pw.set_target(t, int(v))

    proof = data.prove(pw)
    data.verify(proof)
    print("proved leaf", index, "is in the tree with root",
          [int(v) for v in proof.public_inputs])


if __name__ == "__main__":
    main()
