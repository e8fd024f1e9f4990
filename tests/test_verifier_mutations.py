"""Verifier-side adversarial matrix (VERDICT r2 weak #4).

The ported negative matrix (test_negative_matrix.py) covers PROVE-time
rejections, faithful to the reference's #[should_panic] style
(naive_mmr_plonky2_verifier.rs:272-383).  This file covers the VERIFIER:
starting from one valid proof, every component class of
plonk/proof.py:Proof and plonk/fri.py:FriProof is mutated in turn and
``CircuitData.verify`` must reject every mutant — these are exactly the
code paths a soundness bug would hide in (plonk/verifier.py,
plonk/fri.py:fri_verify).

Fast tier: test_config proofs from the host prover.  Slow tier: the same
matrix on a standard-config proof and on a device-prover proof.
"""

import copy

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MMR, field
from plonky2_merkle_trees_tpu.circuits.mmr import verify_mmr_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig
from plonky2_merkle_trees_tpu.plonk.field_ext import ExtensionField


def _mmr_case(config, n_leaves=200, index=4):
    # 200 leaves -> a deep enough Merkle walk that the circuit degree
    # exceeds the FRI final-poly bound, so the proof carries fold layers
    # (commit caps + query steps) for the matrix to attack
    rng = np.random.default_rng(2028)
    leaves = [int(x) for x in rng.integers(0, field.P, size=n_leaves,
                                           dtype=np.uint64)]
    mmr = MMR.from_leaves(np.asarray(leaves, dtype=np.uint64))
    pr = mmr.get_proof_normal_index(index)
    root = mmr.bagging_the_peaks()
    data, leaf_t, proof_ts, peak_ts = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks), config=config)
    pw = PartialWitness()
    pw.set_target(leaf_t, leaves[index])
    for (ht, bt), (h, s) in zip(proof_ts, pr.merkle_proof):
        pw.set_hash_target(ht, h)
        pw.set_bool_target(bt, bool(s))
    for pt, pk in zip(peak_ts, pr.peaks):
        pw.set_hash_target(pt, pk)
    for t, v in zip(data.prover_only.public_inputs, root):
        pw.set_target(t, int(v))
    return data, pw


def _bump(v) -> int:
    return (int(v) + 1) % field.P


def _bump_digest(cap, i=0, j=0):
    cap = np.array(cap, dtype=np.uint64, copy=True)
    cap[i, j] = np.uint64(_bump(cap[i, j]))
    return cap


def _bump_ext(e: ExtensionField) -> ExtensionField:
    return ExtensionField(_bump(e.a0), e.a1)


# Every mutator takes a deepcopied ProofWithPublicInputs and corrupts ONE
# component; ids name the proof field being attacked.
MUTATIONS = [
    ("wires_cap", lambda p: setattr(p.proof, "wires_cap",
                                    _bump_digest(p.proof.wires_cap))),
    ("zs_partial_cap", lambda p: setattr(p.proof, "zs_partial_cap",
                                         _bump_digest(p.proof.zs_partial_cap))),
    ("quotient_cap", lambda p: setattr(p.proof, "quotient_cap",
                                       _bump_digest(p.proof.quotient_cap))),
    ("opening_constants_sigmas",
     lambda p: p.proof.openings.constants_sigmas.__setitem__(
         0, _bump_ext(p.proof.openings.constants_sigmas[0]))),
    ("opening_wires",
     lambda p: p.proof.openings.wires.__setitem__(
         0, _bump_ext(p.proof.openings.wires[0]))),
    ("opening_zs",
     lambda p: p.proof.openings.zs.__setitem__(
         0, _bump_ext(p.proof.openings.zs[0]))),
    ("opening_partials",
     lambda p: p.proof.openings.partials.__setitem__(
         0, _bump_ext(p.proof.openings.partials[0]))),
    ("opening_quotient",
     lambda p: p.proof.openings.quotient.__setitem__(
         0, _bump_ext(p.proof.openings.quotient[0]))),
    ("opening_zs_next",
     lambda p: p.proof.openings.zs_next.__setitem__(
         0, _bump_ext(p.proof.openings.zs_next[0]))),
    ("fri_commit_cap",
     lambda p: p.proof.fri.commit_caps.__setitem__(
         0, _bump_digest(p.proof.fri.commit_caps[0]))),
    ("fri_final_poly",
     lambda p: p.proof.fri.final_poly.__setitem__(
         0, _bump_ext(p.proof.fri.final_poly[0]))),
    ("fri_final_poly_extended",  # degree escape: extra nonzero coefficient
     lambda p: p.proof.fri.final_poly.extend(
         [ExtensionField(1)] * len(p.proof.fri.final_poly))),
    ("fri_pow_witness",
     lambda p: setattr(p.proof.fri, "pow_witness",
                       p.proof.fri.pow_witness + 1)),
    ("fri_query_index",
     lambda p: setattr(p.proof.fri.query_rounds[0], "index",
                       p.proof.fri.query_rounds[0].index ^ 1)),
    ("fri_initial_leaf",
     lambda p: p.proof.fri.query_rounds[0].initial.leaf_values.__setitem__(
         1, _bump_row(p.proof.fri.query_rounds[0].initial.leaf_values[1]))),
    ("fri_initial_path",
     lambda p: p.proof.fri.query_rounds[0].initial.paths[1].__setitem__(
         0, _bump_row(p.proof.fri.query_rounds[0].initial.paths[1][0]))),
    ("fri_step_coset",
     lambda p: setattr(p.proof.fri.query_rounds[0].steps[0], "coset_values",
                       _bump_digest(
                           p.proof.fri.query_rounds[0].steps[0].coset_values))),
    ("fri_step_path",
     lambda p: p.proof.fri.query_rounds[0].steps[0].path.__setitem__(
         0, _bump_row(p.proof.fri.query_rounds[0].steps[0].path[0]))),
    ("public_input",
     lambda p: p.public_inputs.__setitem__(0, _bump(p.public_inputs[0]))),
    ("public_input_truncated",
     lambda p: p.public_inputs.pop()),
]


def _bump_row(row):
    row = np.array(row, dtype=np.uint64, copy=True)
    row[0] = np.uint64(_bump(row[0]))
    return row


def _assert_all_mutants_rejected(data, proof):
    # the matrix assumes a proof with at least one FRI fold layer
    assert len(proof.proof.fri.commit_caps) >= 1
    assert len(proof.proof.fri.query_rounds[0].steps) >= 1
    data.verify(proof)  # the honest proof must pass
    failures = []
    for name, mutate in MUTATIONS:
        mutant = copy.deepcopy(proof)
        mutate(mutant)
        try:
            data.verify(mutant)
            failures.append(name)
        except AssertionError:
            pass
    assert not failures, f"verifier ACCEPTED mutated proofs: {failures}"


@pytest.fixture(scope="module")
def test_config_proof():
    data, pw = _mmr_case(CircuitConfig.test_config())
    return data, data.prove(pw)


def test_verifier_rejects_every_mutation_test_config(test_config_proof):
    data, proof = test_config_proof
    _assert_all_mutants_rejected(data, proof)


def test_wrong_circuit_rejects_valid_proof(test_config_proof):
    """A valid proof for circuit A must not verify under circuit B (the
    circuit_digest seeds the transcript, so all challenges diverge)."""
    data, proof = test_config_proof
    # a different proof SHAPE -> a genuinely different circuit (the MMR
    # circuit is parameterized by (nr_proof_elms, nr_peaks) only)
    data_b, pw_b = _mmr_case(CircuitConfig.test_config(), n_leaves=23,
                             index=0)
    assert not np.array_equal(data_b.verifier_only.circuit_digest,
                              data.verifier_only.circuit_digest)
    with pytest.raises(AssertionError):
        data_b.verify(proof)


@pytest.mark.slow
def test_verifier_rejects_every_mutation_standard_config():
    data, pw = _mmr_case(CircuitConfig.standard_recursion_config())
    _assert_all_mutants_rejected(data, data.prove(pw))


@pytest.mark.slow
def test_verifier_rejects_every_mutation_device_prover():
    from plonky2_merkle_trees_tpu.plonk import device as dev
    data, pw = _mmr_case(CircuitConfig.standard_recursion_config())
    _assert_all_mutants_rejected(data, dev.prove_device(data, pw))
