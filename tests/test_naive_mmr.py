"""Naive MMR — structure tests, bagging, subtree proofs, all-indices sweeps
(reference naive_merkle_mountain_ranges.rs:336-825, fixed seeds per SURVEY §4)."""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import NaiveMMR, field
from plonky2_merkle_trees_tpu import poseidon
from plonky2_merkle_trees_tpu.naive_mmr import get_merkle_proof


def _build(n, seed=1):
    leaves = np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)
    mmr = NaiveMMR(int(leaves[0]))
    for leaf in leaves[1:]:
        mmr.add_leaf(int(leaf))
    return mmr, leaves


def test_tree_7_leaves_structure():
    mmr, _ = _build(7)
    # 7 leaves => subtrees of 4+2+1 => heights layout has 3 peaks.
    assert mmr.nr_leaves == 7
    assert len(mmr.peaks) == 3
    assert mmr.max_height == 2
    assert mmr.paint()  # smoke: sketch renders


def test_bagging_peaks_4_leaves():
    # Perfect tree => root equals the only peak (reference :362-374).
    mmr, _ = _build(4)
    bagged = mmr.bagging_the_peaks()
    np.testing.assert_array_equal(bagged.mmr.peaks[0], bagged.root)


def test_bagging_peaks_7_leaves():
    # Peaks must be elements 6, 9, 10 (reference :377-392).
    mmr, _ = _build(7)
    expected = [mmr.elements[6], mmr.elements[9], mmr.elements[10]]
    flat = [int(x) for p in expected for x in p]
    root = poseidon.hash_or_noop_scalar(flat)
    np.testing.assert_array_equal(root, mmr.bagging_the_peaks().root)


def test_bagging_peaks_31_leaves():
    # Peaks of the 31-leaf MMR are elements 30, 45, 52, 55, 56 (reference
    # :395-409 builds new(1 leaf) + 30 add_leaf calls = 31 leaves).
    mmr, _ = _build(31)
    expected = [mmr.elements[i] for i in (30, 45, 52, 55, 56)]
    flat = [int(x) for p in expected for x in p]
    root = poseidon.hash_or_noop_scalar(flat)
    np.testing.assert_array_equal(root, mmr.bagging_the_peaks().root)


def test_merkle_proof_subtree_index0():
    # Proof for leaf 0 in the 8-leaf MMR: elements 1, 5, 13 (reference :412-425).
    mmr, _ = _build(8)
    pr = get_merkle_proof(mmr.elements, mmr.heights, 0, mmr.max_height)
    np.testing.assert_array_equal(pr[0], mmr.elements[1])
    np.testing.assert_array_equal(pr[1], mmr.elements[5])
    np.testing.assert_array_equal(pr[2], mmr.elements[13])


def test_merkle_proof_subtree_index8():
    # Proof for leaf 8: elements 7, 12, 6 (reference :428-441).
    mmr, _ = _build(8)
    pr = get_merkle_proof(mmr.elements, mmr.heights, 8, mmr.max_height)
    np.testing.assert_array_equal(pr[0], mmr.elements[7])
    np.testing.assert_array_equal(pr[1], mmr.elements[12])
    np.testing.assert_array_equal(pr[2], mmr.elements[6])


# MMR-index <-> insertion-ordinal pairs for all-indices sweeps
# (reference :556-742 comments).
_MMR_INDICES = [0, 1, 3, 4, 7, 8, 10, 11, 15, 16, 18, 19, 22, 23, 25, 26,
                31, 32, 34, 35, 38, 39, 41, 42]


@pytest.mark.parametrize("nr_leaves", [8, 16, 18, 22])
def test_proof_all_indices(nr_leaves):
    mmr, leaves = _build(nr_leaves, seed=nr_leaves)
    root = mmr.bagging_the_peaks().root
    for ordinal in range(nr_leaves):
        mmr_index = _MMR_INDICES[ordinal]
        pr = mmr.get_proof(mmr_index)
        # Use the returned relative index (pr[2]) like the reference's
        # 18/21-leaf sweeps do for high indices.
        assert NaiveMMR.verify_proof(pr[2], int(leaves[ordinal]), pr[0], pr[1], root)


def test_extended_proof_carries_subtree_root():
    mmr, leaves = _build(16, seed=16)
    pr = mmr.get_proof(3)
    pr_ext = mmr.get_proof_with_extended_merkleproof(3)
    assert len(pr_ext[0]) == len(pr[0]) + 1
    for a, b in zip(pr[0], pr_ext[0][:-1]):
        np.testing.assert_array_equal(a, b)
    # The appended digest is the peak of the leaf's subtree.
    np.testing.assert_array_equal(pr_ext[0][-1], mmr.peaks[0])


def test_verify_panics_on_peak_miss():
    mmr, leaves = _build(8, seed=2)
    root = mmr.bagging_the_peaks().root
    pr = mmr.get_proof(0)
    with pytest.raises(AssertionError):
        NaiveMMR.verify_proof(0, int(leaves[1]), pr[0], pr[1], root)  # wrong leaf
