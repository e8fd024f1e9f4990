"""Hard-coded 4-leaf / index-0 Merkle-proof circuit, everything public
(reference examples/merkle_tiny_tree_proof.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_merkle_trees_tpu import MerkleTree
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.circuits import verify_merkle_proof_circuit_tiny


def main():
    leaves = [2890852870, 156728478, 2876514289, 984286162]
    tree = MerkleTree.build(leaves)
    proof_elms = tree.get_merkle_proof(0)

    data = verify_merkle_proof_circuit_tiny()
    values = (list(tree.tree[0][0]) + list(proof_elms[0]) + list(proof_elms[1])
              + list(tree.root))
    pw = PartialWitness()
    for t, v in zip(data.prover_only.public_inputs, values):
        pw.set_target(t, int(v))
    proof = data.prove(pw)
    data.verify(proof)
    print("tiny tree proof verified; root =", list(map(int, tree.root)))


if __name__ == "__main__":
    main()
