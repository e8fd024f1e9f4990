"""Checkpoint/serialization round-trips (SURVEY.md §5: the reference has
none; the TPU build adds durable artifacts for trees, MMRs, proofs, and —
crucially for serving — BUILT CIRCUITS, whose from-scratch build costs
minutes of host python per process)."""

import numpy as np
import pytest

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


def test_circuit_checkpoint_resave(tmp_path):
    """save -> load -> save -> load keeps the witness tables intact (a
    loaded circuit has empty root_map/root_id dicts; the re-save must reuse
    the dense target map and stored n_roots instead of deriving 0-sized
    stores — ADVICE r1)."""
    cfg = CircuitConfig.test_config()
    data, pw = _mmr_case(cfg)
    original = data.prove(pw)

    p1 = str(tmp_path / "c1.npz")
    p2 = str(tmp_path / "c2.npz")
    save_circuit(data, p1)
    loaded1 = load_circuit(p1)
    save_circuit(loaded1, p2)          # re-save of a LOADED circuit
    loaded2 = load_circuit(p2)

    vg1 = loaded1.prover_only.vec_gen
    vg2 = loaded2.prover_only.vec_gen
    assert vg2["n_roots"] == vg1["n_roots"] > 0
    assert np.array_equal(vg2["target_ids"], vg1["target_ids"])
    reproved = loaded2.prove(pw)
    loaded2.verify(reproved)
    assert _proof_bytes(reproved) == _proof_bytes(original)


def test_gate_trace_fallback_matches_native():
    """The pure-numpy Poseidon gate-trace twin is bit-identical to the C++
    one (it is the vec-engine fallback when g++ is unavailable)."""
    from plonky2_merkle_trees_tpu import native
    from plonky2_merkle_trees_tpu.plonk.gates import poseidon_gate_trace_batch_np
    rng = np.random.default_rng(7)
    states = rng.integers(0, field.P, size=(5, 12), dtype=np.uint64)
    got = poseidon_gate_trace_batch_np(states)
    assert got.shape == (5, 118)
    if native.available():
        assert np.array_equal(got, native.poseidon_gate_trace_batch(states))


@pytest.mark.slow
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
