"""Merkle-proof verifier circuits for simple trees.

Parity targets:
* ``verify_merkle_proof_circuit(leaf_index, nr_layers)`` — the general
  circuit from examples/merkle_proof_example1.rs:9-64: sibling sides are
  BAKED into the circuit from the index parity walk (a different index means
  a different circuit); the bagged root is the only public input.
* ``verify_merkle_proof_circuit_tiny()`` — the hard-coded 4-leaf / index-0
  demo from examples/merkle_tiny_tree_proof.rs:14-131 where leaf, proof
  elements and root are ALL public inputs.
"""

from typing import List, Tuple

from ..plonk.builder import CircuitBuilder, HashOutTarget
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig


def verify_merkle_proof_circuit(leaf_index: int, nr_layers: int,
                                config: CircuitConfig = None,
                                ) -> Tuple[CircuitData, List[HashOutTarget]]:
    """Returns (circuit_data, witness targets: [leaf_hash, proof elm 0..]).

    The leaf enters as a pre-hashed digest target (like the reference, which
    passes ``tree.tree[0][i]``).  ``config`` defaults to the reference's
    standard_recursion_config; pass CircuitConfig.test_config() for a cheap
    build (used by the multichip dryrun)."""
    targets: List[HashOutTarget] = []
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())

    leaf_to_prove = builder.add_virtual_hash()
    targets.append(leaf_to_prove)

    merkle_proof_elm = builder.add_virtual_hash()
    targets.append(merkle_proof_elm)

    if leaf_index % 2 == 0:
        next_hash = builder.hash_or_noop(
            leaf_to_prove.elements + merkle_proof_elm.elements)
    else:
        next_hash = builder.hash_or_noop(
            merkle_proof_elm.elements + leaf_to_prove.elements)

    current_layer_index = leaf_index // 2
    for _layer in range(1, nr_layers):
        merkle_proof_elm = builder.add_virtual_hash()
        targets.append(merkle_proof_elm)
        if current_layer_index % 2 == 0:
            next_hash = builder.hash_or_noop(
                next_hash.elements + merkle_proof_elm.elements)
        else:
            next_hash = builder.hash_or_noop(
                merkle_proof_elm.elements + next_hash.elements)
        current_layer_index //= 2

    builder.register_public_inputs(next_hash.elements)
    return builder.build(), targets


def verify_merkle_proof_circuit_tiny() -> CircuitData:
    """4-leaf / index-0 circuit with everything registered as public inputs
    (merkle_tiny_tree_proof.rs:43-46)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    leaf_to_prove = builder.add_virtual_hash()
    merkle_proof_elm_0 = builder.add_virtual_hash()
    merkle_proof_elm_1 = builder.add_virtual_hash()

    level1_hash = builder.hash_or_noop(
        leaf_to_prove.elements + merkle_proof_elm_0.elements)
    expected_root = builder.hash_or_noop(
        level1_hash.elements + merkle_proof_elm_1.elements)

    builder.register_public_inputs(leaf_to_prove.elements)
    builder.register_public_inputs(merkle_proof_elm_0.elements)
    builder.register_public_inputs(merkle_proof_elm_1.elements)
    builder.register_public_inputs(expected_root.elements)
    return builder.build()
