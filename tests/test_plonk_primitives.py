"""NTT/LDE, extension field, challenger — prover building blocks."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
from plonky2_merkle_trees_tpu.plonk.field_ext import (
    ExtensionField, W, ext_mul, ext_scalar_mul, base_to_ext)
from plonky2_merkle_trees_tpu.plonk.challenger import Challenger

P = field.P


def _naive_dft(coeffs, n):
    g = field.primitive_root_of_unity(n.bit_length() - 1)
    out = []
    for i in range(n):
        x = pow(g, i, P)
        out.append(nttmod.evaluate_poly(coeffs, x))
    return np.array(out, dtype=np.uint64)


def test_ntt_matches_naive_dft():
    rng = np.random.default_rng(1)
    for log_n in (0, 1, 3, 6):
        n = 1 << log_n
        coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
        got = nttmod.ntt(coeffs)
        np.testing.assert_array_equal(got, _naive_dft(coeffs, n))


def test_ntt_roundtrip():
    rng = np.random.default_rng(2)
    coeffs = rng.integers(0, P, size=256, dtype=np.uint64)
    np.testing.assert_array_equal(nttmod.intt(nttmod.ntt(coeffs)), coeffs)


def test_ntt_batched_and_jax():
    rng = np.random.default_rng(3)
    coeffs = rng.integers(0, P, size=(5, 64), dtype=np.uint64)
    got_np = nttmod.ntt(coeffs)
    got_jax = np.asarray(nttmod.ntt(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(got_np, got_jax)
    for i in range(5):
        np.testing.assert_array_equal(got_np[i], _naive_dft(coeffs[i], 64))


def test_coset_lde_values():
    rng = np.random.default_rng(4)
    n, rate_bits = 32, 3
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    lde = nttmod.coset_lde(coeffs, rate_bits)
    assert lde.shape == (n << rate_bits,)
    big_n = n << rate_bits
    g = field.primitive_root_of_unity(big_n.bit_length() - 1)
    shift = field.MULTIPLICATIVE_GROUP_GENERATOR
    for i in (0, 1, 17, big_n - 1):
        x = shift * pow(g, i, P) % P
        assert int(lde[i]) == nttmod.evaluate_poly(coeffs, x)


def test_coset_intt_roundtrip():
    rng = np.random.default_rng(5)
    coeffs = rng.integers(0, P, size=64, dtype=np.uint64)
    evals = nttmod.coset_lde(coeffs, 0)
    np.testing.assert_array_equal(nttmod.coset_intt(evals), coeffs)


def test_w_is_nonresidue():
    assert pow(W, (P - 1) // 2, P) == P - 1


def test_extension_field_axioms():
    a = ExtensionField(123456789, 987654321)
    b = ExtensionField(P - 5, 42)
    c = ExtensionField(777, P - 1)
    assert (a + b) * c == a * c + b * c
    assert a * b == b * a
    assert (a * a.inverse()) == ExtensionField(1)
    assert a ** 5 == a * a * a * a * a
    assert (a / b) * b == a
    # X^2 == W
    x = ExtensionField(0, 1)
    assert x * x == ExtensionField(W)


def test_ext_mul_vectorized_matches_host():
    rng = np.random.default_rng(6)
    a = rng.integers(0, P, size=(10, 2), dtype=np.uint64)
    b = rng.integers(0, P, size=(10, 2), dtype=np.uint64)
    got = ext_mul(a, b)
    for i in range(10):
        ea = ExtensionField(int(a[i, 0]), int(a[i, 1]))
        eb = ExtensionField(int(b[i, 0]), int(b[i, 1]))
        ec = ea * eb
        assert [int(got[i, 0]), int(got[i, 1])] == [ec.a0, ec.a1]


def test_ext_scalar_mul():
    rng = np.random.default_rng(7)
    a = rng.integers(0, P, size=(4, 2), dtype=np.uint64)
    s = ExtensionField(33, 44)
    got = ext_scalar_mul(a, s)
    for i in range(4):
        ec = ExtensionField(int(a[i, 0]), int(a[i, 1])) * s
        assert [int(got[i, 0]), int(got[i, 1])] == [ec.a0, ec.a1]


def test_base_to_ext():
    a = np.array([5, 6], dtype=np.uint64)
    e = base_to_ext(a)
    np.testing.assert_array_equal(e, np.array([[5, 0], [6, 0]], dtype=np.uint64))


def test_challenger_deterministic_and_transcript_sensitive():
    c1, c2, c3 = Challenger(), Challenger(), Challenger()
    for c in (c1, c2):
        c.observe_elements([1, 2, 3])
    c3.observe_elements([1, 2, 4])
    a, b, c = c1.get_challenge(), c2.get_challenge(), c3.get_challenge()
    assert a == b != c
    assert 0 <= a < P


def test_challenger_many_challenges_distinct():
    ch = Challenger()
    ch.observe_elements(range(20))
    vals = ch.get_n_challenges(30)
    assert len(set(vals)) == 30


def test_challenger_extension_challenge():
    ch = Challenger()
    ch.observe_hash([9, 9, 9, 9])
    e = ch.get_extension_challenge()
    assert isinstance(e, ExtensionField)
    assert not e.is_zero()
