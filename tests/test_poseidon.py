"""Poseidon permutation + sponge — bit-exactness anchors.

Golden vectors come from the reference's deterministic tests
(/root/reference/src/simple_merkle_tree/simple_merkle_tree.rs:120-191):
they pin the ChaCha8-regenerated round constants, the MDS layer, the round
structure and the sponge modes all at once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_merkle_trees_tpu import poseidon, field
from plonky2_merkle_trees_tpu.poseidon_constants import all_round_constants, GOLDILOCKS_P

# two_to_one([2890852870,0,0,0], [156728478,0,0,0]) — level-1 node of the
# 4-leaf golden tree (simple_merkle_tree.rs:138).
GOLDEN_L = np.array([2890852870, 0, 0, 0], dtype=np.uint64)
GOLDEN_R = np.array([156728478, 0, 0, 0], dtype=np.uint64)
GOLDEN_OUT = np.array([6678006133445961348, 15827935749738443865,
                       6295652393730592048, 1546515167911236130], dtype=np.uint64)

# Root of the golden 4-leaf tree (simple_merkle_tree.rs:140).
GOLDEN_4LEAF_ROOT = np.array([13451271846715771774, 4069913004933160254,
                              14528216580130305557, 9716424959297545638], dtype=np.uint64)


def test_round_constants_regenerated_bit_exact():
    rc = all_round_constants()
    assert len(rc) == 360
    # First four entries of plonky2 0.1.3's ALL_ROUND_CONSTANTS.
    assert rc[0] == 0xB585F766F2144405
    assert rc[1] == 0x7746A55F43921AD7
    assert rc[2] == 0xB2FB0D31CEE799B4
    assert rc[3] == 0x0F6760A4803427D7
    assert all(0 <= c < GOLDILOCKS_P for c in rc)


@pytest.mark.parametrize("xp", [np, jnp])
def test_two_to_one_golden(xp):
    got = poseidon.two_to_one(xp.asarray(GOLDEN_L), xp.asarray(GOLDEN_R))
    np.testing.assert_array_equal(np.asarray(got), GOLDEN_OUT)


def test_two_to_one_scalar_golden():
    got = poseidon.two_to_one_scalar(GOLDEN_L, GOLDEN_R)
    np.testing.assert_array_equal(got, GOLDEN_OUT)


@pytest.mark.parametrize("xp", [np, jnp])
def test_batched_matches_scalar(xp):
    rng = np.random.default_rng(7)
    states = rng.integers(0, field.P, size=(16, 12), dtype=np.uint64)
    batched = np.asarray(poseidon.permute(xp.asarray(states)))
    for i in range(16):
        expected = poseidon.permute_host([int(v) for v in states[i]])
        np.testing.assert_array_equal(batched[i].astype(object),
                                      np.array(expected, dtype=object))


def test_hash_or_noop_rule():
    # <= 4 inputs: zero-padded, NOT hashed (simple_merkle_tree.rs:136 level-0).
    for n in range(1, 5):
        inputs = np.arange(1, n + 1, dtype=np.uint64)
        got = poseidon.hash_or_noop(inputs)
        expected = np.zeros(4, dtype=np.uint64)
        expected[:n] = inputs
        np.testing.assert_array_equal(got, expected)
    # 5+ inputs: really hashed.
    inputs = np.arange(1, 6, dtype=np.uint64)
    got = poseidon.hash_or_noop(inputs)
    assert not np.array_equal(got[:4], np.arange(1, 5, dtype=np.uint64))
    np.testing.assert_array_equal(got, poseidon.hash_or_noop_scalar(list(range(1, 6))))


def test_sponge_multi_chunk():
    # 12 inputs => two absorb chunks (8 + 4 partial); cross-check scalar vs
    # array paths, and overwrite-mode semantics (partial chunk only overwrites
    # the leading lanes).
    inputs = np.arange(100, 112, dtype=np.uint64)
    a = poseidon.hash_no_pad(inputs)
    b = poseidon.hash_no_pad_scalar(list(range(100, 112)))
    np.testing.assert_array_equal(a, b)


def test_two_to_one_equals_sponge_of_8():
    l = np.array([1, 2, 3, 4], dtype=np.uint64)
    r = np.array([5, 6, 7, 8], dtype=np.uint64)
    np.testing.assert_array_equal(
        poseidon.two_to_one(l, r),
        poseidon.hash_no_pad(np.concatenate([l, r])))


def test_golden_4leaf_root_via_hashes():
    leaves = [2890852870, 156728478, 2876514289, 984286162]
    l0 = [poseidon.hash_or_noop_scalar([v]) for v in leaves]
    n0 = poseidon.two_to_one_scalar(l0[0], l0[1])
    n1 = poseidon.two_to_one_scalar(l0[2], l0[3])
    np.testing.assert_array_equal(n0, GOLDEN_OUT)
    np.testing.assert_array_equal(
        n1, np.array([6698018865469624861, 12486244005715193285,
                      11330639022572315007, 6059804404595156248], dtype=np.uint64))
    root = poseidon.two_to_one_scalar(n0, n1)
    np.testing.assert_array_equal(root, GOLDEN_4LEAF_ROOT)
