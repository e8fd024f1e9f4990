"""Jitted device kernels for bulk hashing and Merkle reduction.

These are the XLA entry points for the hot paths (SURVEY.md §3.1: per-level
pairwise hashing is embarrassingly parallel within a level, strictly
sequential across levels).  Each tree level is ONE batched Poseidon
permutation; the level loop is unrolled at trace time (log2(N) static
iterations), so the whole build is a single XLA program.

u64 lanes are emulated by XLA as u32 pairs on TPU; the Pallas kernel in
poseidon_pallas.py implements the same permutation on explicit u32 limbs.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .. import poseidon


@jax.jit
def permute_states(states):
    """Batched Poseidon permutation: (N, 12) uint64 -> (N, 12) uint64."""
    return poseidon.permute(states)


@jax.jit
def hash_two_to_one(left, right):
    """Batched two_to_one: (N, 4), (N, 4) -> (N, 4)."""
    return poseidon.two_to_one(left, right)


def _reduce_level(level):
    pairs = level.reshape(-1, 2, 4)
    return poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])


@jax.jit
def tree_root(leaves):
    """Full Merkle root of a power-of-two (N,) uint64 leaf vector, keeping
    only the current level (O(N) memory)."""
    level = poseidon.hash_leaves(leaves)
    n = level.shape[0]
    while n > 1:
        level = _reduce_level(level)
        n //= 2
    return level[0]


@jax.jit
def tree_levels(leaves):
    """All levels of the tree (leaf level first, root excluded) plus the
    root — device analog of MerkleTree.build (simple_merkle_tree.rs:28-51)."""
    level = poseidon.hash_leaves(leaves)
    levels = [level]
    while level.shape[0] > 2:
        level = _reduce_level(level)
        levels.append(level)
    root = poseidon.two_to_one(level[0], level[1])
    return levels, root


@partial(jax.jit, static_argnames=("cap_height",))
def merkle_cap(leaves_digests, cap_height: int):
    """Reduce a (N, 4) digest level to a 2^cap_height Merkle cap — the
    commitment primitive of the plonk engine (plonky2-style Merkle caps)."""
    level = leaves_digests
    while level.shape[0] > (1 << cap_height):
        level = _reduce_level(level)
    return level
