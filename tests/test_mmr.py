"""Optimized MMR — round-trips with fixed seeds, bulk-builder equivalence,
panic parity (reference merkle_mountain_ranges.rs tests + SURVEY.md §4)."""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MMR, field
from plonky2_merkle_trees_tpu.utils.index_math import get_mmr_index

def _leaves(n, seed=1):
    return np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)


def _build(n, seed=1):
    leaves = _leaves(n, seed)
    mmr = MMR()
    for leaf in leaves:
        mmr.add_leaf(int(leaf))
    return mmr, leaves


def test_add_leaf_element_count():
    # MMR size for n leaves is 2n - popcount(n).
    for n in (1, 2, 3, 7, 16, 100):
        mmr, _ = _build(n)
        assert len(mmr.elements) == 2 * n - bin(n).count("1")


def test_peaks_count_matches_popcount():
    for n in (1, 2, 3, 7, 11, 16, 30):
        mmr, _ = _build(n)
        assert len(mmr.get_peaks()) == bin(n).count("1")


@pytest.mark.parametrize("nr_leaves", [2, 3, 7, 8, 16, 21, 31])
def test_proof_roundtrip_all_indices(nr_leaves):
    mmr, leaves = _build(nr_leaves, seed=nr_leaves)
    root = mmr.bagging_the_peaks()
    for k in range(nr_leaves):
        proof = mmr.get_proof_normal_index(k)
        assert proof.verify(int(leaves[k]), root)


def test_proof_mmr_index_api():
    # reference test_get_proof (:343-374): leaf_index 7 is the 5th insert.
    mmr, leaves = _build(16, seed=9)
    proof = mmr.get_proof(7)
    root = mmr.bagging_the_peaks()
    assert proof.verify(int(leaves[4]), root)
    assert proof.mmr_size == len(mmr.elements)


def test_single_leaf_root_is_leaf_hash():
    # 1 peak => bagged root == peak (noop rule).
    mmr, leaves = _build(1)
    root = mmr.bagging_the_peaks()
    np.testing.assert_array_equal(root, np.array([leaves[0], 0, 0, 0], dtype=np.uint64))


def test_verify_panics_on_wrong_peaks():
    # Leaf ordinal 9 of an 11-leaf MMR (8+2+1) lives in the SECOND subtree;
    # replacing all peaks with peaks[0] erases its subtree root => assert.
    mmr, leaves = _build(11, seed=3)
    root = mmr.bagging_the_peaks()
    proof = mmr.get_proof_normal_index(9)
    proof.peaks = [proof.peaks[0]] * len(proof.peaks)
    with pytest.raises(AssertionError):
        proof.verify(int(leaves[9]), root)


def test_verify_false_on_wrong_root():
    mmr, leaves = _build(11, seed=4)
    proof = mmr.get_proof_normal_index(2)
    wrong_root = np.array([1, 2, 3, 4], dtype=np.uint64)
    assert not proof.verify(int(leaves[2]), wrong_root)


@pytest.mark.parametrize("nr_leaves", [1, 2, 3, 4, 5, 6, 7, 8, 15, 16, 17, 21, 33, 100])
def test_bulk_builder_matches_sequential(nr_leaves):
    leaves = _leaves(nr_leaves, seed=nr_leaves + 100)
    seq = MMR()
    for leaf in leaves:
        seq.add_leaf(int(leaf))
    bulk = MMR.from_leaves(leaves)
    assert len(bulk.elements) == len(seq.elements)
    for a, b in zip(bulk.elements, seq.elements):
        np.testing.assert_array_equal(a, b)


def test_bulk_builder_large_roundtrip():
    n = 1500
    leaves = _leaves(n, seed=555)
    mmr = MMR.from_leaves(leaves)
    root = mmr.bagging_the_peaks()
    for k in (0, 1, 700, n - 1):
        assert mmr.get_proof_normal_index(k).verify(int(leaves[k]), root)
