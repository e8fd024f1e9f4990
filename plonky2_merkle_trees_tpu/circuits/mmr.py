"""MMR verifier circuits (flat, non-recursive).

Parity targets:
* ``verify_mmr_proof_circuit(nr_merkle_proof_elms, nr_peaks)`` — the
  optimized-MMR circuit (src/mmr/mmr_plonky2_verifier.rs:13-91): sibling
  sides are WITNESS booleans consumed by an in-circuit pick_hash mux, so one
  circuit serves every leaf position with that proof shape.  Returns
  (circuit_data, leaf_target, [(hash_target, bool_target)], peak_targets).
* ``verify_naive_mmr_proof_circuit(relative_leaf_index, nr_proof_elms,
  nr_peaks)`` — the naive-MMR circuit (naive_mmr_plonky2_verifier.rs:9-98):
  sides BAKED from get_standard_index, leaf enters pre-hashed; returns
  (circuit_data, targets list).

Both check peak membership with the reference's OR-``equal`` gadget by
default (soundness quirk §2.4.1); pass ``strict_equal=True`` for the AND
fix.  The membership result is forced true via connect(one, ...) exactly
like the reference (mmr_plonky2_verifier.rs:75-78, which notes assert_bool
"doesn't work").
"""

from typing import List, Tuple

from ..plonk.builder import BoolTarget, CircuitBuilder, HashOutTarget
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig
from ..utils.index_math import get_standard_index
from .gadgets import equal, equal_strict, or_list, pick_hash


def _check_peaks_and_bag(builder: CircuitBuilder, next_hash: HashOutTarget,
                         nr_peaks: int, strict_equal: bool,
                         register_peaks_as_public: bool = False):
    """Shared tail: peak membership check + bagging; returns peak targets."""
    eq_fn = equal_strict if strict_equal else equal
    peaks: List[HashOutTarget] = []
    equals: List[BoolTarget] = []
    for _ in range(nr_peaks):
        peak = builder.add_virtual_hash()
        peaks.append(peak)
        if register_peaks_as_public:
            builder.register_public_inputs(peak.elements)
        equals.append(eq_fn(builder, peak, next_hash))

    hash_in_peaks = or_list(builder, equals)
    one = builder.one()
    builder.connect(one, hash_in_peaks.target)

    if not register_peaks_as_public:
        if len(peaks) > 1:
            root = builder.hash_n_to_hash_no_pad(
                [e for p in peaks for e in p.elements])
            builder.register_public_inputs(root.elements)
        else:
            # 1 peak: the bagged root IS the peak (noop rule).
            builder.register_public_inputs(peaks[0].elements)
    return peaks


def verify_mmr_proof_circuit(nr_merkle_proof_elms: int, nr_peaks: int,
                             strict_equal: bool = False,
                             config: CircuitConfig = None
                             ) -> Tuple[CircuitData, int,
                                        List[Tuple[HashOutTarget, BoolTarget]],
                                        List[HashOutTarget]]:
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    proof_targets: List[Tuple[HashOutTarget, BoolTarget]] = []

    leaf_to_prove = builder.add_virtual_target()
    next_hash = builder.hash_or_noop([leaf_to_prove])

    for _ in range(nr_merkle_proof_elms):
        merkle_proof_elm = builder.add_virtual_hash()
        elm_on_left = builder.add_virtual_bool_target_safe()
        proof_targets.append((merkle_proof_elm, elm_on_left))
        # Option 1: sibling on the left; option 2: sibling on the right.
        option1 = builder.hash_or_noop(
            merkle_proof_elm.elements + next_hash.elements)
        option2 = builder.hash_or_noop(
            next_hash.elements + merkle_proof_elm.elements)
        next_hash = pick_hash(builder, option1, option2, elm_on_left)

    peak_targets = _check_peaks_and_bag(builder, next_hash, nr_peaks, strict_equal)
    return builder.build(), leaf_to_prove, proof_targets, peak_targets


def verify_naive_mmr_proof_circuit(relative_leaf_index: int, nr_proof_elms: int,
                                   nr_peaks: int, strict_equal: bool = False
                                   ) -> Tuple[CircuitData, List[HashOutTarget]]:
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
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

    peak_targets = _check_peaks_and_bag(builder, next_hash, nr_peaks, strict_equal)
    targets.extend(peak_targets)
    return builder.build(), targets
