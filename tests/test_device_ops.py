"""Device kernels + sharded forest: jitted builders match the host reference;
the 8-virtual-device CPU mesh forest root equals the single-chip root
(cross-host determinism analog, SURVEY.md §4)."""

import jax
import numpy as np
import jax.numpy as jnp

from plonky2_merkle_trees_tpu import MerkleTree, field
from plonky2_merkle_trees_tpu.ops import tree_root, tree_levels, hash_two_to_one, merkle_cap
from plonky2_merkle_trees_tpu.parallel import make_mesh, forest_root, forest_peaks


def _leaves(n, seed=11):
    return np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)


def test_tree_root_matches_host():
    leaves = _leaves(256)
    host = MerkleTree.build(leaves)
    dev = tree_root(jnp.asarray(leaves))
    np.testing.assert_array_equal(np.asarray(dev), host.root)


def test_tree_levels_matches_host():
    leaves = _leaves(64)
    host = MerkleTree.build(leaves)
    levels, root = tree_levels(jnp.asarray(leaves))
    assert len(levels) == host.count_levels
    for got, want in zip(levels, host.tree):
        np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(root), host.root)


def test_hash_two_to_one_batched():
    rng = np.random.default_rng(3)
    l = rng.integers(0, field.P, size=(32, 4), dtype=np.uint64)
    r = rng.integers(0, field.P, size=(32, 4), dtype=np.uint64)
    got = np.asarray(hash_two_to_one(jnp.asarray(l), jnp.asarray(r)))
    from plonky2_merkle_trees_tpu import poseidon
    for i in range(32):
        np.testing.assert_array_equal(got[i], poseidon.two_to_one_scalar(l[i], r[i]))


def test_merkle_cap():
    leaves = _leaves(128)
    host = MerkleTree.build(leaves)
    from plonky2_merkle_trees_tpu import poseidon
    digests = poseidon.hash_leaves(jnp.asarray(leaves))
    cap = np.asarray(merkle_cap(digests, 2))       # 4 caps == level 5 of the tree
    np.testing.assert_array_equal(cap, host.tree[5])
    root_cap = np.asarray(merkle_cap(digests, 0))  # cap height 0 == root
    np.testing.assert_array_equal(root_cap[0], host.root)


def test_forest_root_equals_single_chip():
    assert jax.device_count() == 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(8)
    leaves = _leaves(8 * 64)
    expected = MerkleTree.build(leaves).root
    got = forest_root(jnp.asarray(leaves), mesh)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_forest_peaks_are_subtree_roots():
    mesh = make_mesh(8)
    leaves = _leaves(8 * 32)
    peaks = np.asarray(forest_peaks(jnp.asarray(leaves), mesh))
    for d in range(8):
        sub = MerkleTree.build(leaves[d * 32:(d + 1) * 32])
        np.testing.assert_array_equal(peaks[d], sub.root)


def test_forest_root_deterministic_across_runs():
    mesh = make_mesh(8)
    leaves = _leaves(8 * 16, seed=99)
    a = np.asarray(forest_root(jnp.asarray(leaves), mesh))
    b = np.asarray(forest_root(jnp.asarray(leaves), mesh))
    np.testing.assert_array_equal(a, b)
