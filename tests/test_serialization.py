"""Checkpoint/serialization round-trips (SURVEY.md §5: the reference has
none; the TPU build adds durable artifacts for trees, MMRs, proofs, and —
crucially for serving — BUILT CIRCUITS, whose from-scratch build costs
minutes of host python per process)."""

import numpy as np

from plonky2_merkle_trees_tpu import MMR, MerkleTree, field
from plonky2_merkle_trees_tpu.serialization import (
    save_mmr, load_mmr, save_tree, load_tree, save_proof, load_proof,
    save_circuit, load_circuit)
from plonky2_merkle_trees_tpu.circuits import verify_mmr_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig

from test_device_prover import _proof_bytes


def _leaves(n, seed=0):
    return [int(v) for v in
            np.random.default_rng(seed).integers(0, field.P, n, dtype=np.uint64)]


def test_mmr_roundtrip(tmp_path):
    mmr = MMR.from_leaves(_leaves(11, 1))
    p = str(tmp_path / "mmr.npz")
    save_mmr(mmr, p)
    back = load_mmr(p)
    assert [list(map(int, e)) for e in back.elements] == \
        [list(map(int, e)) for e in mmr.elements]
    assert list(back.bagging_the_peaks()) == list(mmr.bagging_the_peaks())


def test_tree_roundtrip(tmp_path):
    tree = MerkleTree.build(_leaves(16, 2))
    p = str(tmp_path / "tree.npz")
    save_tree(tree, p)
    back = load_tree(p)
    assert list(map(int, back.root)) == list(map(int, tree.root))
    assert back.get_merkle_proof(5)[0].tolist() == \
        tree.get_merkle_proof(5)[0].tolist()


def _mmr_case(config):
    leaves = _leaves(11, 3)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(4)
    root = mmr.bagging_the_peaks()
    data, leaf_t, proof_ts, peak_ts = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks), config=config)
    pw = PartialWitness()
    pw.set_target(leaf_t, leaves[4])
    for (ht, bt), (h, s) in zip(proof_ts, pr.merkle_proof):
        pw.set_hash_target(ht, h)
        pw.set_bool_target(bt, bool(s))
    for pt, pk in zip(peak_ts, pr.peaks):
        pw.set_hash_target(pt, pk)
    for t, v in zip(data.prover_only.public_inputs, root):
        pw.set_target(t, int(v))
    return data, pw


def test_circuit_checkpoint_roundtrip(tmp_path):
    """A checkpointed circuit proves with a byte-identical transcript and
    its proofs verify under the original verifier data (same digest)."""
    cfg = CircuitConfig.test_config()
    data, pw = _mmr_case(cfg)
    original = data.prove(pw)

    p = str(tmp_path / "circuit.npz")
    save_circuit(data, p)
    loaded = load_circuit(p)

    assert loaded.common.degree_bits == data.common.degree_bits
    assert np.array_equal(
        np.asarray(loaded.verifier_only.circuit_digest),
        np.asarray(data.verifier_only.circuit_digest))

    reproved = loaded.prove(pw)
    loaded.verify(reproved)
    data.verify(reproved)          # original verifier accepts it too
    assert _proof_bytes(reproved) == _proof_bytes(original)


def test_circuit_checkpoint_device_prover(tmp_path, monkeypatch):
    """A checkpoint-loaded circuit also proves through the fused device
    orchestrator (the serving path) with a byte-identical transcript."""
    monkeypatch.setenv("PMT_PROVER_DEVICE", "1")
    cfg = CircuitConfig.test_config()
    data, pw = _mmr_case(cfg)
    p = str(tmp_path / "circuit.npz")
    save_circuit(data, p)
    loaded = load_circuit(p)
    from plonky2_merkle_trees_tpu.plonk import device as dev
    proved = dev.prove_device(loaded, pw)
    loaded.verify(proved)
    monkeypatch.setenv("PMT_PROVER_DEVICE", "0")
    assert _proof_bytes(proved) == _proof_bytes(data.prove(pw))


def test_proof_roundtrip(tmp_path):
    cfg = CircuitConfig.test_config()
    data, pw = _mmr_case(cfg)
    proof = data.prove(pw)
    p = str(tmp_path / "proof.json")
    save_proof(proof, p)
    back = load_proof(p)
    data.verify(back)
    assert _proof_bytes(back) == _proof_bytes(proof)
