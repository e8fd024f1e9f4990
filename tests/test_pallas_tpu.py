"""Pallas kernel tests — require real TPU hardware, skipped on the CPU mesh.

Run manually with: PMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py
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


@requires_tpu
@pytest.mark.parametrize("log_n,batch,inverse",
                         [(12, 4, False), (15, 3, True), (18, 2, False)])
def test_ntt_pallas_bit_exact(log_n, batch, inverse):
    """Compiled four-step Pallas NTT vs the host reference, on-chip."""
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.ops import ntt_pallas
    from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
    import jax.numpy as jnp

    rng = np.random.default_rng(11 + log_n)
    x = rng.integers(0, field.P, size=(batch, 1 << log_n), dtype=np.uint64)
    want = nttmod.ntt(x, inverse=inverse)            # numpy path
    got = np.asarray(ntt_pallas.ntt_pallas(jnp.asarray(x), inverse))
    np.testing.assert_array_equal(want, got)


@requires_tpu
def test_coset_lde_dispatch_bit_exact():
    """coset_lde through ntt()'s Pallas dispatch vs the numpy path."""
    import os
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
    import jax.numpy as jnp

    assert os.environ.get("PMT_NTT_PALLAS", "1") != "0"
    rng = np.random.default_rng(13)
    coeffs = rng.integers(0, field.P, size=(5, 1 << 12), dtype=np.uint64)
    want = nttmod.coset_lde(coeffs, 3)
    got = np.asarray(jax.jit(lambda c: nttmod.coset_lde(c, 3))(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(want, got)


@requires_tpu
def test_gate_fold_pallas_matches_xla_on_device():
    """Compiled ops/gate_kernel.py vs the XLA gate-term fold, on hardware."""
    import jax.numpy as jnp
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.ops import gate_kernel as gk
    from plonky2_merkle_trees_tpu.plonk.algebra import BatchAlgebra
    from plonky2_merkle_trees_tpu.plonk.vanishing import (
        eval_gate_constraints, _powers_vec)
    from plonky2_merkle_trees_tpu.plonk.gates import GATE_INDEX, NUM_SELECTORS

    m = 2048
    rng = np.random.default_rng(77)
    wires = rng.integers(0, field.P, size=(135, m), dtype=np.uint64)
    sels = rng.integers(0, 2, size=(NUM_SELECTORS, m)).astype(np.uint64)
    consts = rng.integers(0, field.P, size=(2, m), dtype=np.uint64)
    pi = rng.integers(0, field.P, size=4, dtype=np.uint64)
    alphas = rng.integers(0, field.P, size=2, dtype=np.uint64)

    alg = BatchAlgebra(np, m)
    with np.errstate(over="ignore"):
        gate_terms = eval_gate_constraints(
            alg, [sels[i] for i in range(NUM_SELECTORS)],
            [wires[i] for i in range(135)], [consts[0], consts[1]],
            [np.full(m, v, dtype=np.uint64) for v in pi])
        expected, apow_rows = [], []
        for a in alphas:
            pw = _powers_vec(np, np.uint64(a), gk.NUM_GATE_TERMS)
            apow_rows.append(pw)
            acc = np.zeros(m, dtype=np.uint64)
            for j, t in enumerate(gate_terms):
                acc = field.add(acc, field.mul(pw[j], t))
            expected.append(acc)

    sel4 = np.stack([sels[GATE_INDEX[g]] for g in
                     ("arithmetic", "constant", "public_input", "poseidon")])
    got = np.asarray(gk.gate_terms_fold_pallas(
        jnp.asarray(wires[:130]), jnp.asarray(sel4), jnp.asarray(consts),
        jnp.asarray(pi), jnp.asarray(np.stack(apow_rows)), block=512))
    np.testing.assert_array_equal(got, np.stack(expected))


@requires_tpu
def test_ratios_pallas_matches_xla_on_device():
    """Compiled ops/perm_kernel.py vs the XLA permutation-ratio path, on
    hardware (bit-identical incl. the Montgomery-batched inverse)."""
    import jax.numpy as jnp
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.ops.perm_kernel import ratios_pallas, CHUNK

    n, r_wires, nc = 4096, 80, 2
    num_chunks = r_wires // CHUNK
    rng = np.random.default_rng(83)
    routed = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    tags = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    sigmas = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    betas = rng.integers(0, field.P, size=nc, dtype=np.uint64)
    gammas = rng.integers(0, field.P, size=nc, dtype=np.uint64)

    with np.errstate(over="ignore"):
        f_stack, g_stack = [], []
        for c in range(nc):
            f = field.add(routed, field.add(field.mul(tags, betas[c]),
                                            gammas[c]))
            g = field.add(routed, field.add(field.mul(sigmas, betas[c]),
                                            gammas[c]))
            f_stack.append(f.reshape(num_chunks, CHUNK, n))
            g_stack.append(g.reshape(num_chunks, CHUNK, n))
        fp, gp = np.stack(f_stack), np.stack(g_stack)
        while fp.shape[2] > 1:
            half = fp.shape[2] // 2
            fp = field.mul(fp[:, :, :half], fp[:, :, half:])
            gp = field.mul(gp[:, :, :half], gp[:, :, half:])
        expected = field.mul(fp[:, :, 0], field.inv_vec(gp[:, :, 0]))

    got = np.asarray(ratios_pallas(
        jnp.asarray(routed), jnp.asarray(tags), jnp.asarray(sigmas),
        jnp.asarray(betas), jnp.asarray(gammas)))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
def test_device_pow_grind_matches_host():
    """fri.find_pow_witness dispatches to the device batch grinder when an
    accelerator is attached; both sides scan nonces in increasing order and
    must return the SAME first-hit witness (transcript-identical)."""
    import os
    from plonky2_merkle_trees_tpu.plonk import fri
    from plonky2_merkle_trees_tpu.plonk.challenger import Challenger
    from plonky2_merkle_trees_tpu import field as f

    rng = np.random.default_rng(7)
    ch = Challenger()
    ch.observe_elements([int(v) for v in
                         rng.integers(0, f.P, size=9, dtype=np.uint64)])
    dev = fri.find_pow_witness(ch, 12)
    old = os.environ.get("PMT_POW_DEVICE")
    os.environ["PMT_POW_DEVICE"] = "0"
    try:
        host = fri.find_pow_witness(ch, 12)
    finally:
        if old is None:
            os.environ.pop("PMT_POW_DEVICE", None)
        else:
            os.environ["PMT_POW_DEVICE"] = old
    assert dev == host
