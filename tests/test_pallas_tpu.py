"""Pallas kernel tests — require real TPU hardware, skipped on the CPU mesh.

Run manually with: JAX_PLATFORMS=axon python -m pytest tests/test_pallas_tpu.py
(the conftest forces CPU, under which these skip)."""

import numpy as np
import pytest
import jax

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs TPU hardware")


@requires_tpu
def test_permute_pallas_bit_exact():
    from plonky2_merkle_trees_tpu import poseidon, field
    from plonky2_merkle_trees_tpu.ops.poseidon_pallas import permute_pallas

    rng = np.random.default_rng(5)
    states = rng.integers(0, field.P, size=(256, 12), dtype=np.uint64)
    got = np.asarray(permute_pallas(states, block=256))
    for i in (0, 100, 255):
        expected = poseidon.permute_host([int(v) for v in states[i]])
        assert list(map(int, got[i])) == expected


@requires_tpu
def test_two_to_one_pallas_matches_xla():
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.ops.poseidon_pallas import two_to_one_pallas
    from plonky2_merkle_trees_tpu.ops.tree_kernels import hash_two_to_one
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    l = jnp.asarray(rng.integers(0, field.P, size=(512, 4), dtype=np.uint64))
    r = jnp.asarray(rng.integers(0, field.P, size=(512, 4), dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(two_to_one_pallas(l, r, block=512)),
        np.asarray(hash_two_to_one(l, r)))
