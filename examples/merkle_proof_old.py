"""Smallest hash-in-circuit demo: two virtual hashes, one in-circuit
two_to_one, prove (reference examples/merkle_proof_old.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plonky2_merkle_trees_tpu import MerkleTree, poseidon
from plonky2_merkle_trees_tpu.plonk import CircuitBuilder, PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig


def main():
    leaves = [2890852870, 156728478, 2876514289, 984286162]
    tree = MerkleTree.build(leaves)
    res_leaf_2 = tree.get_merkle_proof(2)
    leaf_hashed = poseidon.hash_or_noop_scalar([leaves[2]])

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    start_hash_target = builder.add_virtual_hash()
    hash0 = builder.add_virtual_hash()
    builder.hash_or_noop(start_hash_target.elements + hash0.elements)

    pw = PartialWitness()
    pw.set_hash_target(start_hash_target, leaf_hashed)
    pw.set_hash_target(hash0, res_leaf_2[0])

    data = builder.build()
    proof = data.prove(pw)
    print("done")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
