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

from .. import poseidon


@jax.jit
def permute_states(states):
    """Batched Poseidon permutation: (N, 12) uint64 -> (N, 12) uint64."""
    return poseidon.permute(states)


@jax.jit
def hash_two_to_one(left, right):
    """Batched two_to_one: (N, 4), (N, 4) -> (N, 4)."""
    return poseidon.two_to_one(left, right)


_PALLAS_MIN_ROWS = 1 << 14


def _permute_traced(state):
    """Permutation inside a traced program: the fused Pallas kernel (34M
    hashes/s, ~7x the XLA-u64 emulation) for large batches on a real TPU
    backend; bit-exact either way."""
    if jax.default_backend() in ("tpu", "axon") and \
            int(state.shape[0]) >= _PALLAS_MIN_ROWS:
        from .poseidon_pallas import permute_pallas
        return permute_pallas(state)
    return poseidon.permute(state)


def _reduce_level(level):
    import jax.numpy as jnp
    pairs = level.reshape(-1, 2, 4)
    state = jnp.concatenate(
        [pairs[:, 0, :], pairs[:, 1, :],
         jnp.zeros((pairs.shape[0], 4), dtype=jnp.uint64)], axis=-1)
    return _permute_traced(state)[:, :4]


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


def _reduce_digests_root(digests):
    """(k, 4) digests -> root digest (k a power of two)."""
    level = digests
    while level.shape[0] > 1:
        level = _reduce_level(level)
    return level[0]


_reduce_digests_root_jit = jax.jit(_reduce_digests_root)


def tree_root_large(leaves, chunk_log: int = 20):
    """Merkle root of a large power-of-two leaf vector via fixed-size
    subtree programs.

    One monolithic XLA program for 2^24+ leaves overwhelms the remote TPU
    compile service; instead the leaf axis is split into 2^chunk_log
    subtrees, each built by the SAME compiled program (one executable,
    bounded memory), and the subtree roots are reduced on device.  Root is
    bit-identical to ``tree_root`` (same pairing order).  This mirrors the
    multi-chip Merkle-forest decomposition (parallel/forest.py) on a single
    chip."""
    n = int(leaves.shape[0])
    chunk = 1 << chunk_log
    if n <= chunk:
        return tree_root(leaves)
    assert n % chunk == 0
    roots = [tree_root(leaves[i * chunk:(i + 1) * chunk])
             for i in range(n // chunk)]
    import jax.numpy as jnp
    return _reduce_digests_root_jit(jnp.stack(roots))


@partial(jax.jit, static_argnames=("cap_height",))
def merkle_cap(leaves_digests, cap_height: int):
    """Reduce a (N, 4) digest level to a 2^cap_height Merkle cap — the
    commitment primitive of the plonk engine (plonky2-style Merkle caps)."""
    level = leaves_digests
    while level.shape[0] > (1 << cap_height):
        level = _reduce_level(level)
    return level
