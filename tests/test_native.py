"""Native C++ host library — bit-exactness against the pure-Python paths."""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MMR, field, native, poseidon

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++)")


def test_native_permute_bit_exact():
    rng = np.random.default_rng(3)
    states = rng.integers(0, field.P, size=(32, 12), dtype=np.uint64)
    got = native.permute_batch(states)
    for i in (0, 13, 31):
        assert [int(v) for v in got[i]] == \
            poseidon.permute_host([int(v) for v in states[i]])


def test_native_two_to_one_golden():
    l = np.array([2890852870, 0, 0, 0], dtype=np.uint64)
    r = np.array([156728478, 0, 0, 0], dtype=np.uint64)
    got = native.two_to_one(l, r)[0]
    np.testing.assert_array_equal(
        got, np.array([6678006133445961348, 15827935749738443865,
                       6295652393730592048, 1546515167911236130], dtype=np.uint64))


def test_native_hash_no_pad():
    inputs = list(range(100, 112))
    np.testing.assert_array_equal(
        native.hash_no_pad(np.array(inputs, dtype=np.uint64)),
        poseidon.hash_no_pad_scalar(inputs))


def test_native_tree_level():
    rng = np.random.default_rng(4)
    level = rng.integers(0, field.P, size=(16, 4), dtype=np.uint64)
    got = native.tree_level(level)
    exp = poseidon.two_to_one(level[0::2], level[1::2])
    np.testing.assert_array_equal(got, exp)


def test_native_mmr_matches_sequential():
    rng = np.random.default_rng(5)
    for n in (1, 2, 7, 33, 100):
        leaves = rng.integers(0, field.P, size=n, dtype=np.uint64)
        seq = MMR()
        for leaf in leaves:
            seq.add_leaf(int(leaf))
        got = native.mmr_from_leaves(leaves)
        np.testing.assert_array_equal(got, np.stack(seq.elements))
