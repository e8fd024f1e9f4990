"""SimpleMerkleTree — golden vectors, proofs, negative tests.

Mirrors the reference's inline tests
(/root/reference/src/simple_merkle_tree/simple_merkle_tree.rs:117-309),
with randomized tests switched to fixed PRNG keys (SURVEY.md §4.3).
"""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MerkleTree, verify_merkle_proof, field

LEAVES_4 = [2890852870, 156728478, 2876514289, 984286162]

# All levels + root of the 4-leaf golden tree (simple_merkle_tree.rs:131-141).
GOLDEN_4_LEVEL1 = [
    [6678006133445961348, 15827935749738443865, 6295652393730592048, 1546515167911236130],
    [6698018865469624861, 12486244005715193285, 11330639022572315007, 6059804404595156248],
]
GOLDEN_4_ROOT = [13451271846715771774, 4069913004933160254,
                 14528216580130305557, 9716424959297545638]

LEAVES_16 = [
    14786323743454721611, 976503040092093812, 4644130751253292674, 6522877527545910706,
    11021172818651636092, 12048403458499719587, 11457874926809001558, 14982007443548219923,
    4546369223935415035, 7205140577604465038, 4644130751253292674, 4208177174652750506,
    16147116534354400672, 18147003476480002882, 14133393155459789216, 9890944065319669426,
]

# Levels 1-3 + root of the 16-leaf golden tree (simple_merkle_tree.rs:181-190).
GOLDEN_16_LEVEL1 = [
    [16072672881132969138, 16679487992876356669, 4319836168073005766, 14599992432910949662],
    [13939588529466633382, 10763620781372339433, 2004324520800166618, 12719277447629989832],
    [14656282042201240311, 6170970616712589521, 11157357638961986056, 5438125353060943827],
    [2852357662721872796, 9295427221128388695, 16660079770794313894, 16593848747552204277],
    [1050226065911802874, 3351649260676358938, 8999655484267522522, 8103734492761011635],
    [13846094456198376205, 9253307167504386126, 4161612500674764592, 7803567864857746324],
    [12908760732062415960, 7139572648574712447, 5556204547814336347, 3348534187924876571],
    [3098588497934611450, 6742117982852617524, 916011858354471608, 2853499230617662209],
]
GOLDEN_16_LEVEL2 = [
    [2804654470754882522, 10755905498140000489, 4068725548728740598, 3390508811108791323],
    [12809105246780417325, 17913287784403914705, 15645466341003679334, 9087376211576685650],
    [47027546173659393, 10025915649153530159, 13833576669443475941, 16760048762533095483],
    [9702041242754623164, 9442892912940285811, 2205638039663440432, 4535189628500499303],
]
GOLDEN_16_LEVEL3 = [
    [13714743953980303059, 8312649863783971264, 16925076622785735252, 9754399915922106354],
    [14079844864384152521, 6499705357519308869, 16026207645313349904, 15079809878245341298],
]
GOLDEN_16_ROOT = [2659148958598424285, 16496267010313658247,
                  12216516055477211974, 15749220035779350537]


def _assert_digests(got, expected):
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.uint64),
        np.asarray(expected, dtype=np.uint64))


def test_build_merkle_tree_4_leaves():
    tree = MerkleTree.build(LEAVES_4)
    assert tree.count_levels == 2
    assert len(tree.tree) == 2  # root excluded from levels (quirk :44-45)
    for i, leaf in enumerate(LEAVES_4):
        _assert_digests(tree.tree[0][i], [leaf, 0, 0, 0])
    _assert_digests(tree.tree[1], GOLDEN_4_LEVEL1)
    _assert_digests(tree.root, GOLDEN_4_ROOT)


def test_build_merkle_tree_16_leaves():
    # from_noncanonical_u128 inputs; all below p so canonical already.
    leaves = [field.from_noncanonical_u128(v) for v in LEAVES_16]
    assert leaves == LEAVES_16
    tree = MerkleTree.build(leaves)
    assert tree.count_levels == 4
    for i, leaf in enumerate(LEAVES_16):
        _assert_digests(tree.tree[0][i], [leaf, 0, 0, 0])
    _assert_digests(tree.tree[1], GOLDEN_16_LEVEL1)
    _assert_digests(tree.tree[2], GOLDEN_16_LEVEL2)
    _assert_digests(tree.tree[3], GOLDEN_16_LEVEL3)
    _assert_digests(tree.root, GOLDEN_16_ROOT)


def test_merkle_proof_small_tree():
    tree = MerkleTree.build(LEAVES_4)
    proof = tree.get_merkle_proof(0)
    _assert_digests(proof[0], [156728478, 0, 0, 0])
    _assert_digests(proof[1], GOLDEN_4_LEVEL1[1])


def test_verify_small_merkle_proof():
    tree = MerkleTree.build(LEAVES_4)
    assert verify_merkle_proof(LEAVES_4[0], 0, tree.root, tree.get_merkle_proof(0))
    assert verify_merkle_proof(LEAVES_4[3], 3, tree.root, tree.get_merkle_proof(3))


def test_verify_merkle_proof_16():
    tree = MerkleTree.build(LEAVES_16)
    proofs = [tree.get_merkle_proof(i) for i in range(16)]
    for i in range(16):
        assert verify_merkle_proof(LEAVES_16[i], i, tree.root, proofs[i])
    # Negative cases (reference :298-306):
    assert not verify_merkle_proof(LEAVES_16[1], 0, tree.root, proofs[0])   # wrong leaf
    assert not verify_merkle_proof(LEAVES_16[0], 1, tree.root, proofs[0])   # wrong index
    assert not verify_merkle_proof(LEAVES_16[0], 0, tree.root, proofs[1])   # wrong proof
    assert not verify_merkle_proof(LEAVES_16[0], 0, tree.tree[0][0], proofs[0])  # wrong root


def test_non_power_of_two_raises():
    with pytest.raises(ValueError):
        MerkleTree.build([1, 2, 3])


def test_get_in_between_hashes():
    tree = MerkleTree.build(LEAVES_16)
    hashes = tree.get_in_between_hashes(5)
    assert len(hashes) == 4  # levels 1..3 plus the root
    _assert_digests(hashes[0], tree.tree[1][2])
    _assert_digests(hashes[1], tree.tree[2][1])
    _assert_digests(hashes[2], tree.tree[3][0])
    _assert_digests(hashes[3], tree.root)


def test_random_roundtrip_fixed_seed():
    rng = np.random.default_rng(2024)
    for n in (8, 32, 128):
        leaves = rng.integers(0, field.P, size=n, dtype=np.uint64)
        tree = MerkleTree.build(leaves)
        for i in (0, n // 3, n - 1):
            assert verify_merkle_proof(int(leaves[i]), i, tree.root,
                                       tree.get_merkle_proof(i))
