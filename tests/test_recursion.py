"""Recursive verification tests — BASELINE config 4 parity surface.

Uses CircuitConfig.test_config() (fewer FRI queries / lighter grinding) so
each outer proof stays ~1 minute on the CPU test mesh; protocol shape is
identical to the standard config.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier; fast CI runs -m 'not slow'

from plonky2_merkle_trees_tpu import MMR, MerkleTree, NaiveMMR, field
from plonky2_merkle_trees_tpu.plonk import PartialWitness, WitnessConflict
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig
from plonky2_merkle_trees_tpu.circuits import (
    verify_inner_merkle_proof_circuit,
    verify_naive_inner_merkle_proof_circuit,
    complete_verification_circuit_with_inner_proof,
    initial_proof_circuit, recursive_step,
    verify_merkle_proof_circuit_and_proof)

CFG = CircuitConfig.test_config()


def _leaves(n, seed):
    return np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)


@pytest.fixture(scope="module")
def mmr_recursion_setup():
    """Inner proof for a 7-leaf optimized MMR (reference driver
    mmr_plonky2_verifier_1_recursion.rs:152-221)."""
    leaves = _leaves(7, seed=1)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(3)
    root = mmr.bagging_the_peaks()

    inner, leaf_t, proof_ts = verify_inner_merkle_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks), config=CFG)
    pw1 = PartialWitness()
    pw1.set_target(leaf_t, int(leaves[3]))
    for (ht, bt), (h, left) in zip(proof_ts, pr.merkle_proof):
        pw1.set_hash_target(ht, h)
        pw1.set_bool_target(bt, left)
    pi = inner.prover_only.public_inputs
    idx = 0
    for peak in pr.peaks:
        for j in range(4):
            pw1.set_target(pi[idx + j], int(peak[j]))
        idx += 4
    inner_proof = inner.prove(pw1)
    inner.verify(inner_proof)
    return leaves, mmr, pr, root, inner, inner_proof


def test_mmr_1_recursion_optimized(mmr_recursion_setup):
    leaves, mmr, pr, root, inner, inner_proof = mmr_recursion_setup
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(pr.peaks), config=CFG)
    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for t, peak in zip(peak_ts, pr.peaks):
        pw2.set_hash_target(t, peak)
    for t, v in zip(outer.prover_only.public_inputs, root):
        pw2.set_target(t, int(v))
    final = outer.prove(pw2)
    outer.verify(final)
    assert final.public_inputs == [int(v) for v in root]


def test_mmr_1_recursion_tampered_inner_rejected(mmr_recursion_setup):
    import copy
    leaves, mmr, pr, root, inner, inner_proof = mmr_recursion_setup
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(pr.peaks), config=CFG)
    bad_inner = copy.deepcopy(inner_proof)
    bad_inner.public_inputs[0] = (bad_inner.public_inputs[0] + 1) % field.P
    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, bad_inner)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for t, peak in zip(peak_ts, pr.peaks):
        pw2.set_hash_target(t, peak)
    for t, v in zip(outer.prover_only.public_inputs, root):
        pw2.set_target(t, int(v))
    with pytest.raises((WitnessConflict, AssertionError, RuntimeError)):
        final = outer.prove(pw2)
        outer.verify(final)


def test_naive_mmr_1_recursion():
    """Naive variant with the extended Merkle proof (subtree root appended)
    feeding the inner public input (reference naive_..._1_recursion.rs
    :159-262)."""
    leaves = _leaves(8, seed=2)
    mmr = NaiveMMR(int(leaves[0]))
    for leaf in leaves[1:]:
        mmr.add_leaf(int(leaf))
    bagged = mmr.bagging_the_peaks()
    proof_ext = mmr.get_proof_with_extended_merkleproof(0)
    path, peaks, rel_index = proof_ext
    subtree_root = path[-1]
    merkle_path = path[:-1]

    inner, targets = verify_naive_inner_merkle_proof_circuit(
        rel_index, len(merkle_path), config=CFG)
    pw1 = PartialWitness()
    pw1.set_hash_target(targets[0], mmr.elements[0])
    for i, h in enumerate(merkle_path):
        pw1.set_hash_target(targets[1 + i], h)
    for t, v in zip(inner.prover_only.public_inputs, subtree_root):
        pw1.set_target(t, int(v))
    inner_proof = inner.prove(pw1)
    inner.verify(inner_proof)
    assert inner_proof.public_inputs == [int(v) for v in subtree_root]

    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(peaks), config=CFG)
    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for t, peak in zip(peak_ts, peaks):
        pw2.set_hash_target(t, peak)
    for t, v in zip(outer.prover_only.public_inputs, bagged.root):
        pw2.set_target(t, int(v))
    final = outer.prove(pw2)
    outer.verify(final)
    assert final.public_inputs == [int(v) for v in bagged.root]


def test_example2_recursive_chain_4_leaves():
    """Layer-per-proof chain over a 4-leaf tree (example2 parity: one
    initial proof + one recursive step reaching the root)."""
    leaves = _leaves(4, seed=3)
    tree = MerkleTree.build(leaves)
    merkle_proof = tree.get_merkle_proof(0)
    in_between = tree.get_in_between_hashes(0)

    circuit, proof = verify_merkle_proof_circuit_and_proof(
        0, tree.tree[0][0], merkle_proof, in_between, config=CFG)
    circuit.verify(proof)
    assert proof.public_inputs == [int(v) for v in tree.root]


def test_uniform_chain_8_leaves():
    """Shape-stable chain: an 8-leaf (depth-3) tree walks init -> step1 ->
    uniform, where the uniform circuit verifies a proof of its own shape
    (step1's padded proof at level 2, its own at deeper levels)."""
    from plonky2_merkle_trees_tpu.circuits.merkle_recursion import (
        expected_chain_commitment, uniform_chain_circuits,
        verify_merkle_proof_chain_uniform)

    leaves = _leaves(8, seed=5)
    tree = MerkleTree.build(leaves)
    idx = 5
    merkle_proof = tree.get_merkle_proof(idx)
    in_between = tree.get_in_between_hashes(idx)

    circuit, proof = verify_merkle_proof_chain_uniform(
        idx, tree.tree[0][idx], merkle_proof, in_between, config=CFG)
    circuit.verify(proof)
    # PIs 0..4: the root digest; PIs 4..8: the verifier-data chain commitment
    assert proof.public_inputs[:4] == [int(v) for v in tree.root]
    assert proof.public_inputs[4:] == [
        int(v) for v in expected_chain_commitment(len(merkle_proof), CFG)]

    # the three shapes really are three: init, step1, uniform — and the
    # uniform circuit's inner degree equals its own degree (the fixpoint)
    bundle = uniform_chain_circuits(CFG)
    assert bundle["uniform"][0].common.degree_bits == bundle["degree_bits"]
    assert bundle["step1"][0].common.degree_bits == bundle["degree_bits"]

    # checkpoint roundtrip (bench's warm-start path): a "fresh process"
    # loading the saved bundle must produce a byte-identical transcript
    import json
    import tempfile
    from plonky2_merkle_trees_tpu.circuits import merkle_recursion as mr
    from plonky2_merkle_trees_tpu.plonk.proof import proof_to_json
    with tempfile.TemporaryDirectory() as d:
        mr.save_uniform_chain(bundle, d)
        mr._UNIFORM_CACHE.clear()
        try:
            c2, p2 = verify_merkle_proof_chain_uniform(
                idx, tree.tree[0][idx], merkle_proof, in_between,
                config=CFG, cache_dir=d)
            c2.verify(p2)
            assert json.dumps(proof_to_json(p2)) == \
                json.dumps(proof_to_json(proof))
        finally:
            mr._UNIFORM_CACHE.clear()  # don't leak the loaded bundle


def test_uniform_chain_foreign_circuit_rejected():
    """A VALID proof of a different degree-D 8-PI circuit, smuggled into a
    uniform step in place of the previous level, must be rejected by the
    verifier-data chain binding (VERDICT r1 #7): the step itself accepts it
    (the inner verifier data is witness), but the chain commitment then
    records the foreign verifier data and the final check fails."""
    from plonky2_merkle_trees_tpu.circuits.merkle_recursion import (
        uniform_chain_circuits, verify_chain_binding)
    from plonky2_merkle_trees_tpu.plonk.builder import CircuitBuilder

    bundle = uniform_chain_circuits(CFG)
    D = bundle["degree_bits"]

    # an "evil" circuit with the uniform shape (8 PIs, degree D): it proves
    # knowledge of nothing — it just exposes 8 arbitrary witness values
    builder = CircuitBuilder(CFG)
    ts = [builder.add_virtual_target() for _ in range(8)]
    builder.register_public_inputs(ts)
    evil = builder.build(min_degree_bits=D)
    assert evil.common.degree_bits == D
    pw = PartialWitness()
    fake_root = _leaves(4, seed=7)
    for t, v in zip(ts[:4], fake_root):
        pw.set_target(t, int(v))
    for t in ts[4:]:
        pw.set_target(t, 0)
    evil_proof = evil.prove(pw)
    evil.verify(evil_proof)

    # feed it into a uniform step as if it were the previous chain level
    data, proof_t, vdata_t, sibling_t, side_t = bundle["uniform"]
    sibling = _leaves(4, seed=8)
    step_pw = PartialWitness()
    step_pw.set_hash_target(sibling_t, sibling)
    step_pw.set_bool_target(side_t, True)
    step_pw.set_proof_with_pis_target(proof_t, evil_proof)
    step_pw.set_verifier_data_target(vdata_t, evil.verifier_only)
    step_proof = data.prove(step_pw)     # the step ACCEPTS the foreign proof
    data.verify(step_proof)
    # ... but the binding check rejects the chain
    with pytest.raises(ValueError, match="chain commitment mismatch"):
        verify_chain_binding(step_proof, depth=3, config=CFG)
    with pytest.raises(ValueError, match="chain commitment mismatch"):
        verify_chain_binding(step_proof, depth=2, config=CFG)


def test_uniform_chain_wrong_root_rejected():
    """Tampered in-between hash (wrong expected digest PI) must fail."""
    from plonky2_merkle_trees_tpu.circuits.merkle_recursion import (
        verify_merkle_proof_chain_uniform)
    from plonky2_merkle_trees_tpu.plonk.witness import WitnessConflict

    leaves = _leaves(8, seed=6)
    tree = MerkleTree.build(leaves)
    idx = 2
    merkle_proof = tree.get_merkle_proof(idx)
    in_between = tree.get_in_between_hashes(idx)
    bad = [np.array(h, dtype=np.uint64) for h in in_between]
    bad[-1] = (bad[-1] + np.uint64(1)) % np.uint64(field.P)

    with pytest.raises((WitnessConflict, AssertionError)):
        circuit, proof = verify_merkle_proof_chain_uniform(
            idx, tree.tree[0][idx], merkle_proof, bad, config=CFG)
        circuit.verify(proof)
