"""Device-resident prover (plonk/device.py) parity tests.

Run on the CPU mesh like the rest of the suite: the device orchestrator is
platform-agnostic (jnp arrays + jitted stages); these tests pin its
transcripts to the numpy reference prover byte-for-byte, so the TPU path is
covered by construction (same program, different backend).
"""

import io
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier; fast CI runs -m 'not slow'

from plonky2_merkle_trees_tpu import MMR, MerkleTree, field
from plonky2_merkle_trees_tpu.circuits.merkle import verify_merkle_proof_circuit
from plonky2_merkle_trees_tpu.circuits.mmr import verify_mmr_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.plonk import prover as host_prover
from plonky2_merkle_trees_tpu.plonk import device as dev_prover


def _proof_bytes(pwp) -> bytes:
    buf = io.BytesIO()
    pickle.dump(
        ([list(map(int, d)) for d in pwp.proof.wires_cap],
         [list(map(int, d)) for d in pwp.proof.zs_partial_cap],
         [list(map(int, d)) for d in pwp.proof.quotient_cap],
         [(e.a0, e.a1) for e in pwp.proof.openings.flat()],
         [list(map(int, np.asarray(c).reshape(-1)))
          for c in pwp.proof.fri.commit_caps],
         [(e.a0, e.a1) for e in pwp.proof.fri.final_poly],
         pwp.proof.fri.pow_witness,
         [(qr.index,
           [list(map(int, lv)) for lv in qr.initial.leaf_values],
           [[list(map(int, s)) for s in p] for p in qr.initial.paths],
           [(list(map(int, np.asarray(st.coset_values).reshape(-1))),
             [list(map(int, s)) for s in st.path]) for st in qr.steps])
          for qr in pwp.proof.fri.query_rounds],
         list(pwp.public_inputs)), buf)
    return buf.getvalue()


@pytest.fixture(scope="module")
def merkle_case():
    rng = np.random.default_rng(1)
    leaves = [int(x) for x in rng.integers(0, field.P, size=16, dtype=np.uint64)]
    data, targets = verify_merkle_proof_circuit(3, 4)
    mt = MerkleTree.build(leaves)
    proof = mt.get_merkle_proof(3)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], mt.tree[0][3])
    for ht, h in zip(targets[1:], proof):
        pw.set_hash_target(ht, h)
    for t, v in zip(data.prover_only.public_inputs, mt.root):
        pw.set_target(t, v)
    return data, pw


def test_device_prover_transcript_parity(merkle_case):
    """Device orchestrator (mono pipeline) == numpy prover, byte for byte."""
    data, pw = merkle_case
    p_np = host_prover.prove(data, pw)
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert _proof_bytes(p_np) == _proof_bytes(p_dev)


def test_device_prover_staged_transcript_parity(merkle_case, monkeypatch):
    """The per-stage fallback pipeline stays transcript-identical too."""
    monkeypatch.setenv("PMT_PROVER_MONO", "0")
    data, pw = merkle_case
    p_np = host_prover.prove(data, pw)
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert _proof_bytes(p_np) == _proof_bytes(p_dev)


def test_device_challenger_parity():
    """DeviceChallenger (lazy scan duplex) == host Challenger on an
    arbitrary observe/squeeze schedule, including buffer-edge cases
    (multiple-of-RATE absorbs, >RATE consecutive squeezes)."""
    import jax.numpy as jnp
    from plonky2_merkle_trees_tpu.plonk.challenger import Challenger

    rng = np.random.default_rng(3)
    script = [("obs", 4), ("obs", 64), ("sq", 4), ("obs", 3), ("sq", 2),
              ("obs", 526), ("sq", 2), ("obs", 16), ("sq", 9), ("sq", 1),
              ("obs", 8), ("sq", 2), ("sq", 8)]
    h = Challenger()
    d = dev_prover.DeviceChallenger()
    for kind, k in script:
        if kind == "obs":
            vals = rng.integers(0, field.P, size=k, dtype=np.uint64)
            for v in vals:
                h.observe_element(int(v))
            d.observe_array(jnp.asarray(vals))
        else:
            assert [h.get_challenge() for _ in range(k)] == \
                [int(d.get_challenge()) for _ in range(k)]


def test_device_prover_mmr_circuit():
    """Full MMR flow through prove_device verifies."""
    rng = np.random.default_rng(9)
    leaves = [int(x) for x in rng.integers(0, field.P, size=7, dtype=np.uint64)]
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(3)
    root = mmr.bagging_the_peaks()
    data, leaf_t, proof_ts, peak_ts = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks))
    pw = PartialWitness()
    pw.set_target(leaf_t, leaves[3])
    for (ht, bt), (h, s) in zip(proof_ts, pr.merkle_proof):
        pw.set_hash_target(ht, h)
        pw.set_bool_target(bt, bool(s))
    for pt, pk in zip(peak_ts, pr.peaks):
        pw.set_hash_target(pt, pk)
    for t, v in zip(data.prover_only.public_inputs, root):
        pw.set_target(t, int(v))
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert [int(v) for v in p_dev.public_inputs] == [int(v) for v in root]


def _merkle_pw(data, targets, seed: int):
    """A fresh witness for the baked (index=3, 16-leaf) merkle circuit."""
    rng = np.random.default_rng(seed)
    leaves = [int(x) for x in rng.integers(0, field.P, size=16,
                                           dtype=np.uint64)]
    mt = MerkleTree.build(leaves)
    proof = mt.get_merkle_proof(3)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], mt.tree[0][3])
    for ht, h in zip(targets[1:], proof):
        pw.set_hash_target(ht, h)
    for t, v in zip(data.prover_only.public_inputs, mt.root):
        pw.set_target(t, v)
    return pw


def test_prove_pipelined_transcript_parity(monkeypatch):
    """prove_pipelined (host-phase(i+1) overlapped with device(i)) is a
    scheduling change only: every proof byte-identical to serial prove."""
    monkeypatch.setenv("PMT_PROVER_DEVICE", "1")
    data, targets = verify_merkle_proof_circuit(3, 4)
    jobs = [(data, _merkle_pw(data, targets, seed)) for seed in (11, 12, 13)]
    serial = [dev_prover.prove_device(d, pw) for d, pw in jobs]
    piped = dev_prover.prove_pipelined(jobs)
    assert len(piped) == len(serial)
    for ps, pp in zip(serial, piped):
        data.verify(pp)
        assert _proof_bytes(ps) == _proof_bytes(pp)


def test_prove_merged_program_transcript_parity(merkle_case, monkeypatch):
    """PMT_PROVER_MERGE=1 (P1+P2 fused into one XLA module) changes the
    dispatch count, not one byte of the transcript."""
    monkeypatch.setenv("PMT_PROVER_MERGE", "1")
    data, pw = merkle_case
    p_np = host_prover.prove(data, pw)
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert _proof_bytes(p_np) == _proof_bytes(p_dev)


def test_prove_merged_all_transcript_parity(merkle_case, monkeypatch):
    """PMT_PROVER_MERGE=all (the WHOLE prove — P1+P2+P3 and the fused
    PoW/query tail — as ONE XLA program, the single-TPU default) changes
    the executable count, not one byte of the transcript."""
    monkeypatch.setenv("PMT_PROVER_MERGE", "all")
    monkeypatch.setenv("PMT_FUSED_TAIL", "1")
    data, pw = merkle_case
    p_np = host_prover.prove(data, pw)
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert _proof_bytes(p_np) == _proof_bytes(p_dev)


def test_device_prover_fused_tail_parity(merkle_case, monkeypatch):
    """PMT_FUSED_TAIL=1: the in-P3 PoW grind + query gather (device.py
    _stage_mono_fri tail / DeviceChallenger.grind_and_indices) stays
    byte-identical to the host grind + separate gather program."""
    monkeypatch.setenv("PMT_FUSED_TAIL", "1")
    data, pw = merkle_case
    p_np = host_prover.prove(data, pw)
    p_dev = dev_prover.prove_device(data, pw)
    data.verify(p_dev)
    assert _proof_bytes(p_np) == _proof_bytes(p_dev)
