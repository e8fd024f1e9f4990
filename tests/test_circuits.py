"""Verifier-circuit tests: flat MMR (optimized + naive), simple-tree Merkle
circuits — the reference's L2-L4 parity surface (SURVEY.md §2.1), with the
randomized drivers reduced to representative fixed-seed cases (full sweeps
are minutes of proving; the reference runs them per-file from an IDE)."""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MMR, MerkleTree, NaiveMMR, field
from plonky2_merkle_trees_tpu.plonk import PartialWitness, WitnessConflict
from plonky2_merkle_trees_tpu.circuits import (
    verify_merkle_proof_circuit, verify_merkle_proof_circuit_tiny,
    verify_mmr_proof_circuit, verify_naive_mmr_proof_circuit)


def _leaves(n, seed):
    return np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)


def _run_mmr_verifier(nr_leaves, leaf_normal_index, strict_equal=False,
                      corrupt_peaks=None):
    """Analog of the reference's test_mmr_verifier driver
    (mmr_plonky2_verifier.rs:102-151)."""
    leaves = _leaves(nr_leaves, seed=nr_leaves * 31 + leaf_normal_index)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(leaf_normal_index)

    root = mmr.bagging_the_peaks()
    assert pr.verify(int(leaves[leaf_normal_index]), root)

    data, leaf_target, proof_targets, peak_targets = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks), strict_equal=strict_equal)

    pw = PartialWitness()
    pw.set_target(leaf_target, int(leaves[leaf_normal_index]))
    for (h_t, b_t), (h, on_left) in zip(proof_targets, pr.merkle_proof):
        pw.set_hash_target(h_t, h)
        pw.set_bool_target(b_t, on_left)
    peaks = corrupt_peaks(pr.peaks) if corrupt_peaks else pr.peaks
    for t, peak in zip(peak_targets, peaks):
        pw.set_hash_target(t, peak)
    # Public input: the bagged root (reference sets prover_only.public_inputs)
    if corrupt_peaks is None:
        for t, v in zip(data.prover_only.public_inputs, root):
            pw.set_target(t, int(v))

    proof = data.prove(pw)
    data.verify(proof)
    return data, proof, root


@pytest.mark.parametrize("nr_leaves,index", [(3, 0), (3, 2), (7, 4), (8, 5)])
def test_mmr_verifier_small(nr_leaves, index):
    data, proof, root = _run_mmr_verifier(nr_leaves, index)
    assert proof.public_inputs == [int(v) for v in root]


def test_mmr_verifier_single_leaf():
    # 1 peak, 0 proof elms: root == peak (noop rule in-circuit).
    data, proof, root = _run_mmr_verifier(1, 0)
    assert proof.public_inputs == [int(v) for v in root]


def test_mmr_verifier_wrong_leaf_panics():
    leaves = _leaves(7, seed=5)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(2)
    root = mmr.bagging_the_peaks()
    data, leaf_target, proof_targets, peak_targets = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks))
    pw = PartialWitness()
    pw.set_target(leaf_target, int(leaves[3]))  # WRONG leaf
    for (h_t, b_t), (h, on_left) in zip(proof_targets, pr.merkle_proof):
        pw.set_hash_target(h_t, h)
        pw.set_bool_target(b_t, on_left)
    for t, peak in zip(peak_targets, pr.peaks):
        pw.set_hash_target(t, peak)
    with pytest.raises(WitnessConflict):
        data.prove(pw)


def test_equal_gadget_or_quirk_parity():
    """Reference quirk §2.4.1: the OR-equal peak check accepts a corrupted
    peak that matches the true subtree root in just ONE element; the strict
    variant rejects it."""
    def corrupt(peaks):
        # subtree root is peaks[-1]-ish; corrupt EVERY peak to share only
        # element 0 with itself, zeroing the rest.
        out = []
        for p in peaks:
            q = np.array(p)
            q[1:] = 0
            out.append(q)
        return out

    # 7 leaves -> peaks of heights 2,1,0; leaf 0's subtree root is a real
    # hash (all four elements non-zero), so zeroing elements 1..3 only
    # preserves element-0 equality.
    data, proof, _ = _run_mmr_verifier(7, 0, corrupt_peaks=corrupt)
    data.verify(proof)  # unsound acceptance — faithful to the reference

    with pytest.raises(WitnessConflict):
        _run_mmr_verifier(7, 0, strict_equal=True, corrupt_peaks=corrupt)


def _run_naive_verifier(nr_leaves, leaf_index):
    """Analog of do_test_verify_proof (naive_mmr_plonky2_verifier.rs:113-149)."""
    leaves = _leaves(nr_leaves, seed=nr_leaves * 17 + leaf_index)
    mmr = NaiveMMR(int(leaves[0]))
    for leaf in leaves[1:]:
        mmr.add_leaf(int(leaf))
    bagged = mmr.bagging_the_peaks()
    pr = mmr.get_proof(leaf_index)

    data, targets = verify_naive_mmr_proof_circuit(pr[2], len(pr[0]), len(pr[1]))
    pw = PartialWitness()
    pw.set_hash_target(targets[0], mmr.elements[leaf_index])
    for i, h in enumerate(pr[0]):
        pw.set_hash_target(targets[1 + i], h)
    for i, peak in enumerate(pr[1]):
        pw.set_hash_target(targets[len(pr[0]) + 1 + i], peak)
    for t, v in zip(data.prover_only.public_inputs, bagged.root):
        pw.set_target(t, int(v))
    proof = data.prove(pw)
    data.verify(proof)
    return proof, bagged.root


@pytest.mark.parametrize("nr_leaves,leaf_index", [(2, 1), (4, 0), (4, 4), (6, 3)])
def test_naive_mmr_verifier(nr_leaves, leaf_index):
    proof, root = _run_naive_verifier(nr_leaves, leaf_index)
    assert proof.public_inputs == [int(v) for v in root]


def test_merkle_proof_circuit_example1():
    """examples/merkle_proof_example1.rs parity: 4-leaf tree, indexes 0 & 3."""
    leaves = _leaves(4, seed=77)
    tree = MerkleTree.build(leaves)
    for index in (0, 3):
        merkle_proof = tree.get_merkle_proof(index)
        data, targets = verify_merkle_proof_circuit(index, 2)
        pw = PartialWitness()
        pw.set_hash_target(targets[0], tree.tree[0][index])
        pw.set_hash_target(targets[1], merkle_proof[0])
        pw.set_hash_target(targets[2], merkle_proof[1])
        for t, v in zip(data.prover_only.public_inputs, tree.root):
            pw.set_target(t, int(v))
        proof = data.prove(pw)
        data.verify(proof)
        assert proof.public_inputs == [int(v) for v in tree.root]


def test_merkle_proof_circuit_16_leaves():
    leaves = _leaves(16, seed=78)
    tree = MerkleTree.build(leaves)
    index = 7
    merkle_proof = tree.get_merkle_proof(index)
    data, targets = verify_merkle_proof_circuit(index, 4)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], tree.tree[0][index])
    for i, h in enumerate(merkle_proof):
        pw.set_hash_target(targets[1 + i], h)
    for t, v in zip(data.prover_only.public_inputs, tree.root):
        pw.set_target(t, int(v))
    data.verify(data.prove(pw))


def test_merkle_tiny_tree_circuit():
    """merkle_tiny_tree_proof.rs parity: golden 4-leaf tree, everything public."""
    leaves = [2890852870, 156728478, 2876514289, 984286162]
    tree = MerkleTree.build(leaves)
    proof_elms = tree.get_merkle_proof(0)
    data = verify_merkle_proof_circuit_tiny()
    pi = data.prover_only.public_inputs
    pw = PartialWitness()
    values = (list(tree.tree[0][0]) + list(proof_elms[0]) + list(proof_elms[1])
              + list(tree.root))
    for t, v in zip(pi, values):
        pw.set_target(t, int(v))
    proof = data.prove(pw)
    data.verify(proof)
    assert proof.public_inputs == [int(v) for v in values]
