"""Optimized (canonical) Merkle Mountain Range.

Capability parity with the reference ``MMR`` / ``MMR_proof``
(/root/reference/src/mmr/merkle_mountain_ranges.rs):

* single append-only post-order ``elements`` array, everything else computed
  on the fly (:8-12);
* ``add_leaf``           — :89-120 (push leaf hash, then merge with the left
  peak while the peaks bitmap has a run of trailing ones; left sibling sits
  ``2^h - 1`` slots back);
* ``get_peaks``          — :179-200 (greedy largest-subtree scan);
* ``get_proof`` / ``get_proof_normal_index`` — :209-223 / :203-205; proofs
  carry explicit ``(digest, sibling_on_left)`` pairs (:15-23);
* ``bagging_the_peaks``  — :122-127 (``hash_or_noop`` of the concatenated
  peaks; a single peak IS the root, by the noop rule);
* ``MMRProof.verify``    — :232-252, including the reference's panic-on-
  peak-miss behaviour (raises ``AssertionError`` rather than returning
  ``False`` — error-behaviour parity for negative tests).

TPU-first addition (no reference analog): ``MMR.from_leaves`` bulk-builds the
whole range with one batched Poseidon launch per tree height instead of
O(N log N) sequential appends, using the closed forms
``mmr_index(k) = 2k - popcount(k)`` and ``index(node at height h completing
at leaf k) = mmr_index(k) + h``.  This is the distribution primitive for the
sharded "Merkle forest" (parallel/forest.py): peaks of independent shards are
exactly MMR peaks.
"""

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from . import poseidon
from .utils.index_math import get_heights_bitmap_for_mmr_size, get_mmr_index


def _popcounts(arr: np.ndarray) -> np.ndarray:
    return np.array([bin(int(v)).count("1") for v in arr.tolist()], dtype=np.int64)


@dataclass
class MMRProof:
    """MMR membership proof: subtree Merkle path with explicit side flags,
    plus all peaks at proof time (reference merkle_mountain_ranges.rs:14-23)."""

    mmr_size: int
    merkle_proof: List[Tuple[np.ndarray, bool]]  # (digest, sibling_on_left)
    peaks: List[np.ndarray]

    def verify(self, leaf: int, root) -> bool:
        next_hash = poseidon.hash_or_noop_scalar([leaf])
        for sibling, sibling_on_left in self.merkle_proof:
            if sibling_on_left:
                next_hash = poseidon.two_to_one_scalar(sibling, next_hash)
            else:
                next_hash = poseidon.two_to_one_scalar(next_hash, sibling)
        # Panic parity: the reference asserts peak membership (:245).
        assert any(np.array_equal(next_hash, p) for p in self.peaks), \
            "subtree root not among peaks"
        flat = [int(x) for p in self.peaks for x in p]
        calc_root = poseidon.hash_or_noop_scalar(flat)
        return bool(np.array_equal(calc_root, np.asarray(root, dtype=np.uint64)))


class MMR:
    """Append-only MMR; ``elements`` is the flat post-order digest array."""

    def __init__(self, elements: List[np.ndarray] = None):
        self.elements = elements if elements is not None else []

    # -- construction -------------------------------------------------------

    def add_leaf(self, leaf: int) -> None:
        next_hash = poseidon.hash_or_noop_scalar([leaf])
        if not self.elements:
            self.elements.append(next_hash)
            return
        peaks, _pos = get_heights_bitmap_for_mmr_size(len(self.elements))
        current_pos = len(self.elements)
        self.elements.append(next_hash)
        height = 1
        while peaks > 0:
            if peaks & 1:
                prev_peak_index = current_pos - ((1 << height) - 1)
                next_hash = poseidon.two_to_one_scalar(
                    self.elements[prev_peak_index], next_hash)
                self.elements.append(next_hash)
            else:
                break
            peaks >>= 1
            height += 1
            current_pos += 1

    @classmethod
    def from_leaves(cls, leaves) -> "MMR":
        """Bulk-build: one batched hash launch per height (TPU path).

        Produces an ``elements`` array bit-identical to N sequential
        ``add_leaf`` calls.
        """
        leaves = np.asarray(leaves, dtype=np.uint64)
        n = int(leaves.shape[0])
        if n == 0:
            return cls([])
        from .poseidon import _native
        nat = _native()
        if nat:
            return cls(list(nat.mmr_from_leaves(leaves)))
        size = 2 * n - int(bin(n).count("1"))
        out = np.zeros((size, 4), dtype=np.uint64)

        # Leaves: ordinal k sits at 2k - popcount(k).
        ks = np.arange(n, dtype=np.int64)
        leaf_pos = 2 * ks - _popcounts(ks)
        level = poseidon.hash_leaves(leaves)            # (n, 4)
        out[leaf_pos] = level

        # Height h nodes: node j covers leaves [j*2^h, (j+1)*2^h); it exists
        # iff the window is complete, and completes when leaf k=(j+1)*2^h - 1
        # is appended, landing h slots after that leaf.
        h = 1
        while (1 << h) <= n:
            pairs = level.reshape(-1, 2, 4) if level.shape[0] % 2 == 0 \
                else level[:level.shape[0] - 1].reshape(-1, 2, 4)
            level = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
            js = np.arange(level.shape[0], dtype=np.int64)
            last_leaf = (js + 1) * (1 << h) - 1
            node_pos = 2 * last_leaf - _popcounts(last_leaf) + h
            out[node_pos] = level
            h += 1
        return cls(list(out))

    # -- queries -------------------------------------------------------------

    def get_peaks(self) -> List[np.ndarray]:
        peaks = []
        mmr_len = len(self.elements)
        if mmr_len == 0:
            return peaks
        max_tree_size = (1 << mmr_len.bit_length()) - 1
        current_index = mmr_len
        peak_pos = 0
        while max_tree_size > 0:
            if current_index >= max_tree_size:
                peak_pos += max_tree_size
                peaks.append(self.elements[peak_pos - 1])
                current_index -= max_tree_size
            max_tree_size >>= 1
        return peaks

    def bagging_the_peaks(self) -> np.ndarray:
        flat = [int(x) for p in self.get_peaks() for x in p]
        return poseidon.hash_or_noop_scalar(flat)

    def _add_right_elm(self, curr_index, height, proof_elms):
        """Append the right sibling if it is inside the range; returns
        (new_curr_index, still_in_tree)."""
        next_elm_index = curr_index + ((1 << (height + 1)) - 1)
        if next_elm_index < len(self.elements) - 1:
            proof_elms.append((self.elements[next_elm_index], False))
            return next_elm_index + 1, True
        return curr_index, False

    def get_subtree_proof_elm(self, mmr_index: int):
        """Merkle path for the leaf at ``mmr_index`` inside its subtree: walk
        up choosing the left sibling at offset 2^(h+1)-1 when that slot holds
        a same-height node, else the right sibling; stop when the right
        sibling would fall outside the array."""
        proof_elms = []
        curr_index = mmr_index
        intree = True
        height = 0
        while intree:
            offset = (1 << (height + 1)) - 1
            took_left = False
            if curr_index >= offset:
                prev_elm_index = curr_index - offset
                if get_heights_bitmap_for_mmr_size(prev_elm_index)[1] == height:
                    proof_elms.append((self.elements[prev_elm_index], True))
                    curr_index += 1
                    took_left = True
            if not took_left:
                curr_index, intree = self._add_right_elm(curr_index, height, proof_elms)
            height += 1
        return proof_elms

    def get_proof(self, mmr_index: int) -> MMRProof:
        return MMRProof(
            mmr_size=len(self.elements),
            merkle_proof=self.get_subtree_proof_elm(mmr_index),
            peaks=self.get_peaks(),
        )

    def get_proof_normal_index(self, normal_index: int) -> MMRProof:
        return self.get_proof(get_mmr_index(normal_index))
