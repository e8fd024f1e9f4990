"""Naive Merkle Mountain Range (redundant-state variant).

Capability parity with the reference ``naive_MMR`` / ``MMR_bagged``
(/root/reference/src/mmr/naive_merkle_mountain_ranges.rs):

* state: ``elements`` + per-element ``heights`` + ``nr_leaves`` +
  ``max_height`` + ``peaks`` (:21-32);
* ``add_leaf``        — :53-106 (pair rule for the previous leaf, then merge
  equal-height peaks while ``nr_leaves % 2^i == 0``);
* ``bagging_the_peaks`` -> ``MMRBagged`` — :110-117 / :35-38;
* ``get_proof`` / ``get_proof_with_extended_merkleproof`` — :123-135 /
  :142-157 (the extended variant appends the subtree root, needed to split
  verification for the recursive circuit);
* ``verify_proof``    — :163-200 (standard-index side selection, panic on
  peak miss);
* helpers ``get_info_subtree_leaf_index`` (:237-258) and the free
  ``get_merkle_proof`` over (elements, heights) arrays (:262-302);
* ``paint``           — :203-228 (ASCII sketch; returns a string here).
"""

from dataclasses import dataclass
from typing import List

import numpy as np

from . import poseidon
from .utils.index_math import get_standard_index


def _pop_quiet(lst):
    """Rust ``Vec::pop`` parity: popping an empty vec is a no-op (the
    reference's constructor leaves ``peaks`` empty, so the very first merge
    pops one element that was never pushed — naive_merkle_mountain_ranges.rs
    :49,:73-75 relies on Option-returning pop)."""
    if lst:
        lst.pop()


@dataclass
class MMRBagged:
    mmr: "NaiveMMR"
    root: np.ndarray


class NaiveMMR:
    """Naive MMR storing all redundant state (heights, peaks, counters)."""

    def __init__(self, leaf: int):
        leaf_hash = poseidon.hash_or_noop_scalar([leaf])
        self.elements: List[np.ndarray] = [leaf_hash]
        self.heights: List[int] = [0]
        self.nr_leaves: int = 1
        self.max_height: int = 0
        # Parity quirk: the reference's constructor leaves `peaks` EMPTY
        # (naive_merkle_mountain_ranges.rs:49) — the first peak appears only
        # after the second leaf is added.
        self.peaks: List[np.ndarray] = []

    def add_leaf(self, leaf: int) -> None:
        leaf_hash = poseidon.hash_or_noop_scalar([leaf])
        self.elements.append(leaf_hash)
        self.heights.append(0)
        self.nr_leaves += 1
        self.peaks.append(leaf_hash)

        # If the previous element was a leaf, close the pair with a node.
        if self.heights[-2] == 0:
            node_1 = poseidon.two_to_one_scalar(self.elements[-2], leaf_hash)
            self.elements.append(node_1)
            self.heights.append(1)
            if self.max_height == 0:
                self.max_height = 1
            _pop_quiet(self.peaks)
            _pop_quiet(self.peaks)
            self.peaks.append(node_1)

        # Merge higher layers while this leaf count completes a 2^i subtree.
        for i in range(2, self.max_height + 2):
            nr_leaves_layer = 1 << i
            if self.nr_leaves % nr_leaves_layer == 0:
                prev_peak = self.elements[len(self.elements) - 1 - (nr_leaves_layer - 1)]
                next_node = poseidon.two_to_one_scalar(prev_peak, self.elements[-1])
                self.elements.append(next_node)
                self.heights.append(i)
                self.max_height = max(self.max_height, i)
                _pop_quiet(self.peaks)
                _pop_quiet(self.peaks)
                self.peaks.append(next_node)
            else:
                break

    def bagging_the_peaks(self) -> MMRBagged:
        flat = [int(x) for p in self.peaks for x in p]
        root = poseidon.hash_or_noop_scalar(flat)
        return MMRBagged(mmr=self, root=root)

    def get_proof(self, index: int):
        """Returns (merkle_proof_for_subtree, peaks, relative_leaf_index)."""
        highest_peak_subtree, index_highest_peak, start = \
            get_info_subtree_leaf_index(self, index)
        subtree = self.elements[start:index_highest_peak]
        subtree_heights = self.heights[start:index_highest_peak]
        relative_index = index - start
        merkle_proof = get_merkle_proof(
            subtree, subtree_heights, relative_index, highest_peak_subtree)
        return merkle_proof, self.peaks, relative_index

    def get_proof_with_extended_merkleproof(self, index: int):
        """Like ``get_proof`` but appends the subtree ROOT to the path —
        consumed by the split (recursive) verification."""
        highest_peak_subtree, index_highest_peak, start = \
            get_info_subtree_leaf_index(self, index)
        subtree = self.elements[start:index_highest_peak + 1]
        subtree_heights = self.heights[start:index_highest_peak]
        relative_index = index - start
        merkle_proof = get_merkle_proof(
            subtree, subtree_heights, relative_index, highest_peak_subtree)
        merkle_proof.append(subtree[-1])
        return merkle_proof, self.peaks, relative_index

    @staticmethod
    def verify_proof(relative_leaf_index: int, leaf: int, merkle_proof_subtree,
                     peaks, root_check) -> bool:
        nr_leaves_subtree = 1 << len(merkle_proof_subtree)
        standardized_index = get_standard_index(relative_leaf_index, nr_leaves_subtree)

        leaf_hash = poseidon.hash_or_noop_scalar([leaf])
        if standardized_index % 2 == 0:
            next_hash = poseidon.two_to_one_scalar(leaf_hash, merkle_proof_subtree[0])
        else:
            next_hash = poseidon.two_to_one_scalar(merkle_proof_subtree[0], leaf_hash)
        updated_index = standardized_index // 2

        for i in range(1, len(merkle_proof_subtree)):
            if updated_index % 2 == 0:
                next_hash = poseidon.two_to_one_scalar(next_hash, merkle_proof_subtree[i])
            else:
                next_hash = poseidon.two_to_one_scalar(merkle_proof_subtree[i], next_hash)
            updated_index //= 2

        # Panic parity with the reference's assert (:194).
        assert any(np.array_equal(next_hash, p) for p in peaks), \
            "subtree root not among peaks"

        flat = [int(x) for p in peaks for x in p]
        calc_root = poseidon.hash_or_noop_scalar(flat)
        return bool(np.array_equal(calc_root, np.asarray(root_check, dtype=np.uint64)))

    def paint(self) -> str:
        """ASCII sketch of the mountain range (reference :203-228 prints;
        we return the string)."""
        lines = []
        for height in range(self.max_height, 1, -1):
            count = sum(1 for h in self.heights if h == height)
            lines.append(" /\\ " * count)
        lines.append("".join("/" if i % 2 == 0 else "\\" for i in range(self.nr_leaves)))
        return "\n".join(lines)


def get_info_subtree_leaf_index(mmr: NaiveMMR, leaf_index: int):
    """For a leaf, locate its perfect subtree: returns (peak height,
    peak index in the MMR, subtree start index)."""
    highest_peak_subtree = 0
    index_highest_peak = 0
    for i in range(leaf_index, len(mmr.elements)):
        if mmr.heights[i] > highest_peak_subtree:
            highest_peak_subtree = mmr.heights[i]
            index_highest_peak = i
            if highest_peak_subtree == mmr.max_height:
                break
    len_subtree = (1 << highest_peak_subtree) * 2 - 2
    start = index_highest_peak - len_subtree
    return highest_peak_subtree, index_highest_peak, start


def get_merkle_proof(subtree, subtree_heights, leaf_index: int, max_height: int):
    """Standard Merkle proof inside a post-order-laid-out perfect subtree.

    ``leaf_index`` is a position within the subtree slice (an MMR-style
    index); siblings at height h are exactly 2^(h+1)-1 slots away.
    """
    assert subtree_heights[leaf_index] == 0, "index does not belong to a leaf"
    proof_hashes = []

    leaf_right = (leaf_index + 1 < len(subtree_heights)
                  and subtree_heights[leaf_index + 1] == 0)
    if leaf_right:
        proof_hashes.append(subtree[leaf_index + 1])
        updated_index = leaf_index + 1
    else:
        proof_hashes.append(subtree[leaf_index - 1])
        updated_index = leaf_index - 1

    updated_index = max(updated_index, leaf_index) + 1

    for h in range(1, max_height):
        diff = (1 << (h + 1)) - 1
        if updated_index + diff < len(subtree) and subtree_heights[updated_index + diff] == h:
            proof_hashes.append(subtree[updated_index + diff])
            updated_index = updated_index + diff
        else:
            proof_hashes.append(subtree[updated_index - diff])
        updated_index += 1

    return proof_hashes


def get_nr_elms(nr_leaves: int) -> int:
    h = nr_leaves.bit_length() - 1
    return (1 << h) * 2 - 1
