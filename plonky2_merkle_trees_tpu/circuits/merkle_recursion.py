"""Per-layer recursive Merkle-proof verification (example2 parity).

The layer-per-proof chain from examples/merkle_proof_example2.rs:
* ``initial_proof_circuit``   (:15-44): proves one 2-to-1 hash, digest is
  the public input;
* ``recursive_step``          (:50-112): verifies the previous proof
  in-circuit, connects its public output to the next level's input hash,
  hashes with the next sibling (side fixed at build time);
* ``verify_merkle_proof_circuit_and_proof`` (:124-192): chains a full prove
  per tree level — log2(N) sequential full prover runs, the reference's most
  expensive flow (SURVEY.md §3.5).
"""

from typing import List, Tuple

from ..plonk.builder import CircuitBuilder, HashOutTarget
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig
from ..plonk.witness import PartialWitness


def initial_proof_circuit(config: CircuitConfig = None
                          ) -> Tuple[CircuitData, List[HashOutTarget]]:
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    left = builder.add_virtual_hash()
    right = builder.add_virtual_hash()
    digest = builder.hash_or_noop(left.elements + right.elements)
    builder.register_public_inputs(digest.elements)
    return builder.build(), [left, right]


def recursive_step(previous_common, sibling_right_side: bool,
                   config: CircuitConfig = None):
    """Returns (circuit_data, prev_proof_target, prev_verifier_data_target,
    [sibling hash target])."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())

    input_hash = builder.add_virtual_hash()
    prev_proof_target = builder.add_virtual_proof_with_pis(previous_common)
    prev_proof_verifier_data = builder.add_virtual_verifier_data(
        previous_common.config.fri_config.cap_height)

    # connect the previous proof's public output to this level's input
    for e1, e2 in zip(input_hash.elements, prev_proof_target.public_inputs[0:4]):
        builder.connect(e1, e2)

    builder.verify_proof(prev_proof_target, prev_proof_verifier_data,
                         previous_common)

    targets: List[HashOutTarget] = []
    sibling = builder.add_virtual_hash()
    targets.append(sibling)
    if sibling_right_side:
        digest = builder.hash_or_noop(input_hash.elements + sibling.elements)
    else:
        digest = builder.hash_or_noop(sibling.elements + input_hash.elements)
    builder.register_public_inputs(digest.elements)

    return builder.build(), prev_proof_target, prev_proof_verifier_data, targets


def verify_merkle_proof_circuit_and_proof(leaf_index: int, leaf_value,
                                          merkle_proof, in_between_hashes,
                                          config: CircuitConfig = None):
    """Chain one full prove per tree level; returns (final circuit_data,
    final proof) — reference :124-192."""
    initial_data, initial_targets = initial_proof_circuit(config)
    pw = PartialWitness()
    current_leaf_index = leaf_index
    if current_leaf_index % 2 == 0:
        pw.set_hash_target(initial_targets[0], leaf_value)
        pw.set_hash_target(initial_targets[1], merkle_proof[0])
    else:
        pw.set_hash_target(initial_targets[0], merkle_proof[0])
        pw.set_hash_target(initial_targets[1], leaf_value)
    current_leaf_index //= 2
    for t, v in zip(initial_data.prover_only.public_inputs, in_between_hashes[0]):
        pw.set_target(t, int(v))

    prev_common = initial_data.common
    prev_proof = initial_data.prove(pw)
    prev_verifier_data = initial_data.verifier_only
    final_circuit = initial_data

    for i in range(1, len(merkle_proof)):
        current_pw = PartialWitness()
        siblings_right_side = current_leaf_index % 2 == 0
        next_data, prev_proof_target, v_data_target, new_targets = \
            recursive_step(prev_common, siblings_right_side, config)
        current_pw.set_hash_target(new_targets[0], merkle_proof[i])
        current_pw.set_proof_with_pis_target(prev_proof_target, prev_proof)
        current_pw.set_verifier_data_target(v_data_target, prev_verifier_data)
        for t, v in zip(next_data.prover_only.public_inputs, in_between_hashes[i]):
            current_pw.set_target(t, int(v))

        prev_common = next_data.common
        prev_proof = next_data.prove(current_pw)
        prev_verifier_data = next_data.verifier_only
        current_leaf_index //= 2
        final_circuit = next_data

    return final_circuit, prev_proof
