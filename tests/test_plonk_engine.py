"""End-to-end SNARK engine tests: small circuits prove + verify, negative
paths panic/reject (mirrors the reference's circuit test strategy, §4)."""

import copy

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import field, poseidon
from plonky2_merkle_trees_tpu.plonk import (
    CircuitBuilder, PartialWitness, WitnessConflict,
    proof_to_json, proof_from_json)

P = field.P


@pytest.fixture(scope="module")
def cube_circuit():
    builder = CircuitBuilder()
    x = builder.add_virtual_target()
    cube = builder.cube(x)
    builder.register_public_input(x)
    builder.register_public_input(cube)
    return builder.build(), x, cube


def test_cube_prove_verify(cube_circuit):
    # examples/cube.rs parity: "I know x^3".
    data, x, cube = cube_circuit
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(cube, 27)
    proof = data.prove(pw)
    assert proof.public_inputs == [3, 27]
    data.verify(proof)


def test_cube_wrong_claim_panics(cube_circuit):
    data, x, cube = cube_circuit
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(cube, 28)  # wrong: conflicts with the generator's 27
    with pytest.raises(WitnessConflict):
        data.prove(pw)


def test_polynomial_circuit():
    # examples/pol.rs parity: x^3 - 2x^2 + 7x + 11 at x=1 equals 17.
    builder = CircuitBuilder()
    x = builder.add_virtual_target()
    a = builder.cube(x)
    b = builder.square(x)
    b1 = builder.mul_const(2, b)
    b2 = builder.mul_const(P - 1, b1)
    c = builder.mul_const(7, x)
    d = builder.add(a, b2)
    e = builder.add_const(c, 11)
    f = builder.add(d, e)
    builder.register_public_input(x)
    builder.register_public_input(f)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 1)
    pw.set_target(f, 17)
    proof = data.prove(pw)
    assert proof.public_inputs == [1, 17]
    data.verify(proof)

    pw_bad = PartialWitness()
    pw_bad.set_target(x, 1)
    pw_bad.set_target(f, 19)  # the exact pol.rs panic scenario
    with pytest.raises(WitnessConflict):
        data.prove(pw_bad)


def test_hash_circuit_golden_digest():
    builder = CircuitBuilder()
    left = builder.add_virtual_hash()
    right = builder.add_virtual_hash()
    out = builder.hash_n_to_hash_no_pad(left.elements + right.elements)
    builder.register_public_inputs(out.elements)
    data = builder.build()

    l = np.array([2890852870, 0, 0, 0], dtype=np.uint64)
    r = np.array([156728478, 0, 0, 0], dtype=np.uint64)
    expected = poseidon.two_to_one_scalar(l, r)
    pw = PartialWitness()
    pw.set_hash_target(left, l)
    pw.set_hash_target(right, r)
    proof = data.prove(pw)
    assert proof.public_inputs == [int(v) for v in expected]
    data.verify(proof)


def test_tampered_proof_rejected(cube_circuit):
    data, x, cube = cube_circuit
    pw = PartialWitness()
    pw.set_target(x, 5)
    pw.set_target(cube, 125)
    proof = data.prove(pw)
    data.verify(proof)

    bad = copy.deepcopy(proof)
    bad.public_inputs[1] = 126
    with pytest.raises(AssertionError):
        data.verify(bad)

    bad2 = copy.deepcopy(proof)
    bad2.proof.openings.quotient[0] = bad2.proof.openings.quotient[0] + 1
    with pytest.raises(AssertionError):
        data.verify(bad2)

    bad3 = copy.deepcopy(proof)
    bad3.proof.fri.pow_witness += 1
    with pytest.raises(AssertionError):
        data.verify(bad3)


def test_gadgets_is_equal_select():
    builder = CircuitBuilder()
    x = builder.add_virtual_target()
    y = builder.add_virtual_target()
    b = builder.is_equal(x, y)
    sel = builder.select(b, x, y)
    builder.register_public_input(b.target)
    builder.register_public_input(sel)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 42)
    pw.set_target(y, 42)
    proof = data.prove(pw)
    assert proof.public_inputs == [1, 42]
    data.verify(proof)

    pw2 = PartialWitness()
    pw2.set_target(x, 1)
    pw2.set_target(y, 2)
    proof2 = data.prove(pw2)
    assert proof2.public_inputs == [0, 2]
    data.verify(proof2)


def test_proof_json_roundtrip(cube_circuit):
    data, x, cube = cube_circuit
    pw = PartialWitness()
    pw.set_target(x, 2)
    pw.set_target(cube, 8)
    proof = data.prove(pw)
    blob = proof_to_json(proof)
    import json
    restored = proof_from_json(json.loads(json.dumps(blob)))
    data.verify(restored)


def test_vec_engine_matches_legacy_generators():
    """The vectorised witness engine and the legacy closure walk must fill
    the identical wire matrix on a Poseidon-bearing circuit."""
    import numpy as np
    from plonky2_merkle_trees_tpu.plonk import prover as hp
    from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig

    builder = CircuitBuilder(CircuitConfig.test_config())
    x = builder.add_virtual_target()
    h = builder.hash_or_noop([x, x, x, x, x])   # forces a real permutation
    eq = builder.is_equal(h.elements[0], h.elements[1])
    builder.register_public_inputs(h.elements + [eq.target])
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 7)
    w_vec = hp._run_generators(data, pw)
    assert type(w_vec).__name__ == "VectorWitness"
    m_vec = hp._wire_matrix(data, w_vec)

    vg = data.prover_only.vec_gen
    data.prover_only.vec_gen = None
    w_leg = hp._run_generators(data, pw)
    data.prover_only.vec_gen = vg
    m_leg = hp._wire_matrix(data, w_leg)
    assert np.array_equal(m_vec, m_leg)
    for t in data.prover_only.public_inputs:
        assert w_vec.get_target(t) == w_leg.get_target(t)


def test_circuit_digest_binds_fri_config():
    """circuit_digest must change when any proof-system parameter changes,
    even if the circuit (and thus the constants_sigmas cap) is identical —
    closes the config-substitution footgun for checkpoint-loaded circuits
    (serialization.py round-trips the config unauthenticated)."""
    from dataclasses import replace
    from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig, FriConfig

    def build(cfg):
        builder = CircuitBuilder(cfg)
        x = builder.add_virtual_target()
        builder.register_public_input(builder.cube(x))
        return builder.build()

    base = CircuitConfig.test_config()
    weaker = replace(base, fri_config=FriConfig(num_query_rounds=2,
                                                proof_of_work_bits=0))
    d_base = build(base)
    d_weak = build(weaker)
    import numpy as np
    # same circuit -> same preprocessed cap; digest still differs
    assert np.array_equal(d_base.verifier_only.constants_sigmas_cap,
                          d_weak.verifier_only.constants_sigmas_cap)
    assert not np.array_equal(d_base.verifier_only.circuit_digest,
                              d_weak.verifier_only.circuit_digest)
