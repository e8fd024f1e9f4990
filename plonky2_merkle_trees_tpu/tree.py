"""Simple power-of-two Merkle tree over Poseidon-Goldilocks.

Capability parity with the reference ``MerkleTree``
(/root/reference/src/simple_merkle_tree/simple_merkle_tree.rs):

* ``build``                — :28-51.  Level 0 is ``hash_or_noop`` of each leaf
  (noop rule: digests are ``[leaf,0,0,0]``); interior levels are pairwise
  ``two_to_one``; the root is hashed separately and is NOT stored in
  ``tree`` (quirk at :44-45 — proofs have ``count_levels`` siblings).
* ``get_merkle_proof``     — :55-74 (sibling per level via odd/even walk).
* ``get_in_between_hashes``— :76-86 (path nodes above the leaf, plus root).
* ``verify_merkle_proof``  — :91-109 (free function, boolean result).

TPU-first redesign: instead of the reference's sequential per-pair hashing
loop, every level is ONE batched Poseidon permutation over all node pairs
(embarrassingly parallel within a level, strict dependency across levels).
The default backend is vectorised numpy (host, useful for tests and small
trees); passing jnp arrays routes the same code through XLA, and
``ops.tree_build`` provides the jitted / sharded large-scale builder.
"""

import numpy as np

from . import poseidon
from .utils.index_math import log2_strict


class MerkleTree:
    """Merkle tree storing all levels (root kept separately, like the
    reference's ``tree: Vec<Vec<HashOut>>`` + ``root`` fields)."""

    def __init__(self, count_levels, levels, root):
        self.count_levels = count_levels
        self.tree = levels          # list of (m, 4) uint64 arrays, leaf level first
        self.root = root            # (4,) uint64 array

    @staticmethod
    def build(leaves) -> "MerkleTree":
        """Build from a power-of-two vector of Goldilocks scalars.

        ``leaves``: (N,) uint64 array (or list of ints). Raises on non-power-
        of-two lengths (parity with plonky2_util::log2_strict panic).
        """
        leaves = np.asarray(leaves, dtype=np.uint64)
        count_levels = log2_strict(int(leaves.shape[0]))

        level = poseidon.hash_leaves(leaves)          # (N, 4)
        levels = [level]
        for _ in range(count_levels - 1):
            pairs = level.reshape(-1, 2, 4)
            level = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
            levels.append(level)
        root = poseidon.two_to_one(level[0], level[1])
        return MerkleTree(count_levels, levels, root)

    def get_merkle_proof(self, leaf_index: int):
        """Sibling digest per level, bottom-up (``count_levels`` entries)."""
        if not leaf_index < self.tree[0].shape[0]:
            raise AssertionError("leaf_index out of range")
        proof = []
        idx = leaf_index
        for i in range(self.count_levels):
            sibling = idx - 1 if idx % 2 == 1 else idx + 1
            proof.append(np.array(self.tree[i][sibling]))
            idx //= 2
        return proof

    def get_in_between_hashes(self, leaf_index: int):
        """Intermediate node digests on the leaf->root path, plus the root
        (consumed by the per-layer recursion chain, example2 parity)."""
        if not leaf_index < self.tree[0].shape[0]:
            raise AssertionError("leaf_index out of range")
        idx = leaf_index // 2
        hashes = []
        for i in range(1, self.count_levels):
            hashes.append(np.array(self.tree[i][idx]))
            idx //= 2
        hashes.append(np.array(self.root))
        return hashes


def verify_merkle_proof(leaf: int, leaf_index: int, root, hashes) -> bool:
    """Replay the proof path and compare against ``root`` (boolean API)."""
    root = np.asarray(root, dtype=np.uint64)
    next_hash = poseidon.hash_or_noop(np.array([leaf], dtype=np.uint64))
    idx = leaf_index
    for sibling in hashes:
        sibling = np.asarray(sibling, dtype=np.uint64)
        if idx % 2 == 0:
            next_hash = poseidon.two_to_one(next_hash, sibling)
        else:
            next_hash = poseidon.two_to_one(sibling, next_hash)
        idx //= 2
    return bool(np.array_equal(next_hash, root))
