"""Negative-test matrix: the reference's #[should_panic] scenarios, ported.

Covers (VERDICT r1 #6):
* examples/merkle_proof_example2.rs:271-655 — 8 scenarios on the per-layer
  recursion chain (wrong public input, wrong sibling side, wrong leaf at the
  initial step; wrong proof / wrong index at the top level on 4/16/128-leaf
  trees);
* src/mmr/naive_mmr_plonky2_verifier.rs:272-383 — 6 scenarios on the flat
  naive verifier (wrong leaf x4 sizes, wrong root, wrong peaks);
* src/mmr/naive_mmr_plonky2_verifier_1_recursion.rs:289-467 — wrong inner
  leaf, wrong outer root, and the peaks-drifted-after-add_leaf case.

Failure-class parity: the reference panics inside ``prove().unwrap()``
(plonky2's partition-containment assert); here the same scenarios raise
``WitnessConflict`` during witness generation — the prover refuses to build
a witness whose computed values contradict the registered public inputs.
"""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MerkleTree, NaiveMMR, field
from plonky2_merkle_trees_tpu.circuits import (
    initial_proof_circuit, recursive_step,
    verify_merkle_proof_circuit_and_proof,
    verify_naive_inner_merkle_proof_circuit,
    complete_verification_circuit_with_inner_proof)
from plonky2_merkle_trees_tpu.circuits.mmr import verify_naive_mmr_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness, WitnessConflict
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig

CFG = CircuitConfig.test_config()


def _leaves(n, seed):
    return np.random.default_rng(seed).integers(0, field.P, size=n,
                                                dtype=np.uint64)


def _tree(n, seed=11):
    return MerkleTree.build([int(v) for v in _leaves(n, seed)])


def _naive_mmr(nr_leaves, seed):
    vals = _leaves(nr_leaves, seed)
    mmr = NaiveMMR(int(vals[0]))
    for v in vals[1:]:
        mmr.add_leaf(int(v))
    return mmr


# ---------------------------------------------------------------------------
# example2: initial + one recursive step (merkle_proof_example2.rs:271-427)
# ---------------------------------------------------------------------------

def _initial_proof_leaf0(tree, right_value=None):
    """Initial circuit proving hash(leaf0, sibling); right_value overrides
    the sibling (the wrong-right-leaf scenario passes leaf0 again)."""
    proof0 = tree.get_merkle_proof(0)
    data, targets = initial_proof_circuit(config=CFG)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], tree.tree[0][0])
    pw.set_hash_target(targets[1],
                       proof0[0] if right_value is None else right_value)
    return data, data.prove(pw), proof0


def test_e2_wrong_pub_input_step():
    """Step's expected digest set to the LEAF value instead of the root
    (merkle_proof_example2.rs:271-318)."""
    tree = _tree(4)
    data, proof, proof0 = _initial_proof_leaf0(tree)
    step, prev_t, vdata_t, ts = recursive_step(data.common, True, config=CFG)
    pw = PartialWitness()
    pw.set_hash_target(ts[0], proof0[1])
    for i in range(4):
        pw.set_target(step.prover_only.public_inputs[i],
                      int(tree.tree[0][0][i]))        # wrong: leaf, not root
    pw.set_proof_with_pis_target(prev_t, proof)
    pw.set_verifier_data_target(vdata_t, data.verifier_only)
    with pytest.raises(WitnessConflict):
        step.prove(pw)


def test_e2_wrong_sibling_side_step():
    """Sibling side flag flipped at the step (reference :320-372)."""
    tree = _tree(4)
    data, proof, proof0 = _initial_proof_leaf0(tree)
    # leaf 0's level-1 sibling is on the right; build the step with False
    step, prev_t, vdata_t, ts = recursive_step(data.common, False, config=CFG)
    pw = PartialWitness()
    pw.set_hash_target(ts[0], proof0[1])
    for i in range(4):
        pw.set_target(step.prover_only.public_inputs[i], int(tree.root[i]))
    pw.set_proof_with_pis_target(prev_t, proof)
    pw.set_verifier_data_target(vdata_t, data.verifier_only)
    with pytest.raises(WitnessConflict):
        step.prove(pw)


def test_e2_wrong_right_leaf_initial():
    """Initial step hashes leaf0 with ITSELF instead of its sibling
    (reference :374-427); the chain's root expectation then fails."""
    tree = _tree(4)
    data, proof, proof0 = _initial_proof_leaf0(tree,
                                               right_value=tree.tree[0][0])
    step, prev_t, vdata_t, ts = recursive_step(data.common, True, config=CFG)
    pw = PartialWitness()
    pw.set_hash_target(ts[0], proof0[1])
    for i in range(4):
        pw.set_target(step.prover_only.public_inputs[i], int(tree.root[i]))
    pw.set_proof_with_pis_target(prev_t, proof)
    pw.set_verifier_data_target(vdata_t, data.verifier_only)
    with pytest.raises(WitnessConflict):
        step.prove(pw)


# ---------------------------------------------------------------------------
# example2: top-level chain driver scenarios (reference :501-655)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_leaves,index,leaf_index,proof_index", [
    (4, 1, 1, 0),      # wrong proof: index/leaf 1, proof for 0  (:501-517)
    (4, 1, 0, 0),      # wrong index: proof+leaf for 0, index 1  (:519-537)
    (16, 0, 0, 1),     # wrong proof on 16 leaves                (:567-581)
    (16, 0, 13, 13),   # wrong index: proof+leaf 13, index 0     (:597-611)
    (128, 79, 79, 80),  # wrong proof on 128 leaves              (:641-655)
])
def test_e2_chain_mismatch_rejected(n_leaves, index, leaf_index, proof_index):
    tree = _tree(n_leaves)
    merkle_proof = tree.get_merkle_proof(proof_index)
    in_between = tree.get_in_between_hashes(proof_index)
    with pytest.raises(WitnessConflict):
        verify_merkle_proof_circuit_and_proof(
            index, tree.tree[0][leaf_index], merkle_proof, in_between,
            config=CFG)


# ---------------------------------------------------------------------------
# naive flat verifier (naive_mmr_plonky2_verifier.rs:272-383)
# NOTE: verify_naive_mmr_proof_circuit always builds at standard config
# (reference parity) — these six scenarios also exercise standard-config
# proving in the default suite.
# ---------------------------------------------------------------------------

def _naive_flat_witness(mmr, pr, leaf_value, peaks_override=None,
                        root_override=None):
    path, peaks, rel_index = pr
    data, targets = verify_naive_mmr_proof_circuit(
        rel_index, len(path), len(peaks))
    pw = PartialWitness()
    pw.set_hash_target(targets[0], leaf_value)
    for i, h in enumerate(path):
        pw.set_hash_target(targets[1 + i], h)
    use_peaks = peaks_override if peaks_override is not None else peaks
    for i, pk in enumerate(use_peaks):
        pw.set_hash_target(targets[len(path) + 1 + i], pk)
    root = root_override if root_override is not None \
        else mmr.bagging_the_peaks().root
    for t, v in zip(data.prover_only.public_inputs, root):
        pw.set_target(t, int(v))
    return data, pw


@pytest.mark.parametrize("nr_leaves,leaf_index,wrong_leaf", [
    (1001, 25, 1),       # test_wrong_proof1 (:272-276)
    (16, 10, 11),        # test_wrong_proof2 (:278-282)
    (32, 25, 23),        # test_wrong_proof3 (:284-288)
    (100100, 1, 0),      # test_wrong_proof4 (:290-294)
])
def test_naive_flat_wrong_leaf(nr_leaves, leaf_index, wrong_leaf):
    mmr = _naive_mmr(nr_leaves, seed=nr_leaves)
    pr = mmr.get_proof(leaf_index)
    data, pw = _naive_flat_witness(mmr, pr, mmr.elements[wrong_leaf])
    with pytest.raises(WitnessConflict):
        data.prove(pw)


def test_naive_flat_wrong_root():
    """All four root PIs set to root.elements[0] (reference :298-339).

    With a single peak (32 = 2^5) the root PI targets alias the computed
    bagged-root targets, so the conflict surfaces already at set_target
    time — same failure class as the in-prove conflict, earlier point."""
    mmr = _naive_mmr(32, seed=32)
    pr = mmr.get_proof(0)
    root = mmr.bagging_the_peaks().root
    wrong_root = [int(root[0])] * 4
    with pytest.raises(WitnessConflict):
        data, pw = _naive_flat_witness(mmr, pr, mmr.elements[0],
                                       root_override=wrong_root)
        data.prove(pw)


def test_naive_flat_wrong_peaks():
    """Every peak target set to peaks[0] (reference :341-383): membership
    may still 'pass' (the replicated OR-equal quirk), but the bagged root
    then mismatches the public input."""
    mmr = _naive_mmr(10101, seed=101)
    pr = mmr.get_proof(0)
    path, peaks, rel_index = pr
    data, pw = _naive_flat_witness(mmr, pr, mmr.elements[0],
                                   peaks_override=[peaks[0]] * len(peaks))
    with pytest.raises(WitnessConflict):
        data.prove(pw)


# ---------------------------------------------------------------------------
# naive 1-recursion (naive_mmr_plonky2_verifier_1_recursion.rs:289-467)
# ---------------------------------------------------------------------------

def _naive_inner(mmr, leaf_index, leaf_value):
    """Build + witness the inner subtree circuit from an extended proof."""
    path, peaks, rel_index = mmr.get_proof_with_extended_merkleproof(leaf_index)
    subtree_root = path[-1]
    merkle_path = path[:-1]
    inner, targets = verify_naive_inner_merkle_proof_circuit(
        rel_index, len(merkle_path), config=CFG)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], leaf_value)
    for i, h in enumerate(merkle_path):
        pw.set_hash_target(targets[1 + i], h)
    for t, v in zip(inner.prover_only.public_inputs, subtree_root):
        pw.set_target(t, int(v))
    return inner, pw, peaks


def test_naive_recursion_wrong_inner_leaf():
    """Inner witness uses elements[1] for a leaf-0 proof — the inner prove
    itself must fail (reference :289-346)."""
    mmr = _naive_mmr(16, seed=61)
    inner, pw, _ = _naive_inner(mmr, 0, mmr.elements[1])
    with pytest.raises(WitnessConflict):
        inner.prove(pw)


def test_naive_recursion_wrong_outer_root():
    """Outer root PI set to the first ELEMENT instead of the bagged root
    (reference :349-415)."""
    mmr = _naive_mmr(16, seed=62)
    inner, pw1, peaks = _naive_inner(mmr, 0, mmr.elements[0])
    inner_proof = inner.prove(pw1)
    inner.verify(inner_proof)
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(peaks), config=CFG)
    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for t, pk in zip(peak_ts, peaks):
        pw2.set_hash_target(t, pk)
    # the root PI targets may alias computed bagging targets, so the
    # conflict can surface at set_target time — same failure class
    with pytest.raises(WitnessConflict):
        for t in outer.prover_only.public_inputs[:4]:
            pw2.set_target(t, int(mmr.elements[0][0]))
        outer.prove(pw2)


def test_naive_recursion_peaks_drift():
    """A later add_leaf changes the peaks; the outer proof carrying the OLD
    peaks must not prove against the NEW bagged root (reference :418-467)."""
    mmr = _naive_mmr(15, seed=63)
    inner, pw1, old_peaks = _naive_inner(mmr, 0, mmr.elements[0])
    inner_proof = inner.prove(pw1)
    inner.verify(inner_proof)
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(old_peaks), config=CFG)
    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for t, pk in zip(peak_ts, old_peaks):
        pw2.set_hash_target(t, pk)
    # drift: one more leaf merges 15's four peaks into 16's single peak
    mmr.add_leaf(123456789)
    new_root = mmr.bagging_the_peaks().root
    for t, v in zip(outer.prover_only.public_inputs, new_root):
        pw2.set_target(t, int(v))
    with pytest.raises(WitnessConflict):
        outer.prove(pw2)
