"""Goldilocks field kernels — identities and cross-checks against python-int
ground truth (strategy per reference test layering: vector tests for field
kernels first, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_merkle_trees_tpu import field

P = field.P
RNG = np.random.default_rng(0xC0FFEE)


def _rand_u64(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


@pytest.mark.parametrize("xp", [np, jnp])
def test_add_sub_roundtrip(xp):
    a = xp.asarray(_rand_u64(512))
    b = xp.asarray(_rand_u64(512))
    s = field.add(a, b)
    expected = (np.asarray(a).astype(object) + np.asarray(b).astype(object)) % P
    np.testing.assert_array_equal(np.asarray(s).astype(object), expected)
    d = field.sub(s, b)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(a))


@pytest.mark.parametrize("xp", [np, jnp])
def test_mul_matches_python_int(xp):
    a_np = _rand_u64(512)
    b_np = _rand_u64(512)
    got = np.asarray(field.mul(xp.asarray(a_np), xp.asarray(b_np)))
    expected = (a_np.astype(object) * b_np.astype(object)) % P
    np.testing.assert_array_equal(got.astype(object), expected)


def test_mul_edge_cases():
    edge = np.array([0, 1, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 63),
                     P - (1 << 32), 1 << 33], dtype=np.uint64)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    got = field.mul(a, b)
    expected = (a.astype(object) * b.astype(object)) % P
    np.testing.assert_array_equal(got.astype(object), expected)


def test_mul_small():
    a = _rand_u64(512)
    for c in (0, 1, 8, 17, 41, (1 << 32) - 1):
        got = field.mul_small(a, c)
        expected = (a.astype(object) * c) % P
        np.testing.assert_array_equal(got.astype(object), expected)


def test_exp7():
    a = _rand_u64(64)
    got = field.exp7(a)
    expected = np.array([pow(int(x), 7, P) for x in a], dtype=object)
    np.testing.assert_array_equal(got.astype(object), expected)


def test_neg():
    a = _rand_u64(64)
    np.testing.assert_array_equal(
        field.add(a, field.neg(a)), np.zeros(64, dtype=np.uint64))
    assert field.neg(np.uint64(0)) == 0


def test_roots_of_unity():
    # order-2^k roots: g^(2^k) == 1 and g^(2^(k-1)) == -1
    for k in (1, 2, 10, 32):
        g = field.primitive_root_of_unity(k)
        assert pow(g, 1 << k, P) == 1
        assert pow(g, 1 << (k - 1), P) == P - 1
    assert field.primitive_root_of_unity(1) == P - 1


def test_h_inverse():
    for x in (1, 2, 7, P - 1, 123456789):
        assert (x * field.h_inverse(x)) % P == 1
    with pytest.raises(ZeroDivisionError):
        field.h_inverse(0)


def test_goldilocks_order_constant():
    # reference src/mmr/common.rs:3
    assert P == 18446744069414584321
