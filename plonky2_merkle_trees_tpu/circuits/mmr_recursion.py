"""1-layer recursive MMR verification (optimized + naive variants).

Parity targets:
* optimized (src/mmr/mmr_plonky2_verifier_1_recursion.rs):
  - ``verify_inner_merkle_proof_circuit`` (:20-75): the Merkle walk with the
    pick_hash mux, peak membership checked inside, and the PEAKS registered
    as the inner proof's public inputs (:60-65);
  - ``complete_verification_circuit_with_inner_proof`` (:84-140): embeds full
    proof verification of the inner proof, re-reads inner PI[0..4] as the
    "previous hash" (:111 — note this is the FIRST PEAK in the optimized
    variant, an oddity we reproduce faithfully), re-checks peak membership,
    bags the peaks into the public root.
* naive (src/mmr/naive_mmr_plonky2_verifier_1_recursion.rs):
  - ``verify_naive_inner_merkle_proof_circuit`` (:21-80): baked-side walk,
    public input = the SUBTREE ROOT (:76) — consumed together with
    ``get_proof_with_extended_merkleproof`` so the root is available;
  - the same outer circuit ("This is the same as for the non-naive impl",
    :82).
"""

from typing import List, Tuple

from ..plonk.builder import BoolTarget, CircuitBuilder, HashOutTarget
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig
from ..utils.index_math import get_standard_index
from .gadgets import equal, equal_strict, or_list, pick_hash


def verify_inner_merkle_proof_circuit(nr_merkle_proof_elms: int, nr_peaks: int,
                                      config: CircuitConfig = None,
                                      strict_equal: bool = False
                                      ) -> Tuple[CircuitData, int,
                                                 List[Tuple[HashOutTarget, BoolTarget]]]:
    """Inner circuit (optimized variant): returns (data, leaf_target,
    [(proof elm hash, elm_on_left)]); public inputs are the peaks."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    proof_targets: List[Tuple[HashOutTarget, BoolTarget]] = []

    leaf_to_prove = builder.add_virtual_target()
    next_hash = builder.hash_or_noop([leaf_to_prove])

    for _ in range(nr_merkle_proof_elms):
        merkle_proof_elm = builder.add_virtual_hash()
        elm_on_left = builder.add_virtual_bool_target_safe()
        proof_targets.append((merkle_proof_elm, elm_on_left))
        option1 = builder.hash_or_noop(
            merkle_proof_elm.elements + next_hash.elements)
        option2 = builder.hash_or_noop(
            next_hash.elements + merkle_proof_elm.elements)
        next_hash = pick_hash(builder, option1, option2, elm_on_left)

    eq_fn = equal_strict if strict_equal else equal
    equals: List[BoolTarget] = []
    for _ in range(nr_peaks):
        peak = builder.add_virtual_hash()
        builder.register_public_inputs(peak.elements)
        equals.append(eq_fn(builder, peak, next_hash))
    hash_in_peaks = or_list(builder, equals)
    builder.connect(builder.one(), hash_in_peaks.target)

    return builder.build(), leaf_to_prove, proof_targets


def verify_naive_inner_merkle_proof_circuit(relative_leaf_index: int,
                                            nr_proof_elms: int,
                                            config: CircuitConfig = None
                                            ) -> Tuple[CircuitData, List[HashOutTarget]]:
    """Inner circuit (naive variant): baked-side Merkle walk; public input is
    the subtree root; proof path includes the root as its last element
    (consumed with get_proof_with_extended_merkleproof)."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    targets: List[HashOutTarget] = []

    leaf_to_prove = builder.add_virtual_hash()
    targets.append(leaf_to_prove)
    merkle_proof_elm = builder.add_virtual_hash()
    targets.append(merkle_proof_elm)

    nr_leaves_subtree = 1 << nr_proof_elms
    standardized_index = get_standard_index(relative_leaf_index, nr_leaves_subtree)

    if standardized_index % 2 == 0:
        next_hash = builder.hash_or_noop(
            leaf_to_prove.elements + merkle_proof_elm.elements)
    else:
        next_hash = builder.hash_or_noop(
            merkle_proof_elm.elements + leaf_to_prove.elements)
    current_layer_index = standardized_index // 2
    for _layer in range(1, nr_proof_elms):
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


def complete_verification_circuit_with_inner_proof(
        inner_common, nr_peaks: int, config: CircuitConfig = None,
        strict_equal: bool = False):
    """Outer circuit: verifies the inner proof in-circuit, re-checks that the
    inner public-input digest (PI[0..4]) is among the peaks, bags the peaks
    into the public root.  Returns (circuit_data, proof_target,
    verifier_data_target, peak_targets)."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())

    prev_proof_target = builder.add_virtual_proof_with_pis(inner_common)
    prev_proof_verifier_data = builder.add_virtual_verifier_data(
        inner_common.config.fri_config.cap_height)
    builder.verify_proof(prev_proof_target, prev_proof_verifier_data, inner_common)

    eq_fn = equal_strict if strict_equal else equal
    prev_hash = HashOutTarget(list(prev_proof_target.public_inputs[0:4]))
    peaks: List[HashOutTarget] = []
    equals: List[BoolTarget] = []
    targets: List[HashOutTarget] = []
    for _ in range(nr_peaks):
        peak = builder.add_virtual_hash()
        peaks.append(peak)
        targets.append(peak)
        equals.append(eq_fn(builder, peak, prev_hash))
    hash_in_peaks = or_list(builder, equals)
    builder.connect(builder.one(), hash_in_peaks.target)

    if len(peaks) > 1:
        root = builder.hash_n_to_hash_no_pad(
            [e for p in peaks for e in p.elements])
        builder.register_public_inputs(root.elements)
    else:
        builder.register_public_inputs(peaks[0].elements)

    return builder.build(), prev_proof_target, prev_proof_verifier_data, targets
