"""Device kernels + sharded forest: jitted builders match the host reference;
the 8-virtual-device CPU mesh forest root equals the single-chip root
(cross-host determinism analog, SURVEY.md §4)."""

import jax
import numpy as np
import jax.numpy as jnp

from plonky2_merkle_trees_tpu import MerkleTree, field
from plonky2_merkle_trees_tpu.ops import tree_root, tree_levels, hash_two_to_one, merkle_cap
from plonky2_merkle_trees_tpu.parallel import make_mesh, forest_root, forest_peaks


def _leaves(n, seed=11):
    return np.random.default_rng(seed).integers(0, field.P, size=n, dtype=np.uint64)


def test_tree_root_matches_host():
    leaves = _leaves(256)
    host = MerkleTree.build(leaves)
    dev = tree_root(jnp.asarray(leaves))
    np.testing.assert_array_equal(np.asarray(dev), host.root)


def test_tree_levels_matches_host():
    leaves = _leaves(64)
    host = MerkleTree.build(leaves)
    levels, root = tree_levels(jnp.asarray(leaves))
    assert len(levels) == host.count_levels
    for got, want in zip(levels, host.tree):
        np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(root), host.root)


def test_hash_two_to_one_batched():
    rng = np.random.default_rng(3)
    l = rng.integers(0, field.P, size=(32, 4), dtype=np.uint64)
    r = rng.integers(0, field.P, size=(32, 4), dtype=np.uint64)
    got = np.asarray(hash_two_to_one(jnp.asarray(l), jnp.asarray(r)))
    from plonky2_merkle_trees_tpu import poseidon
    for i in range(32):
        np.testing.assert_array_equal(got[i], poseidon.two_to_one_scalar(l[i], r[i]))


def test_merkle_cap():
    leaves = _leaves(128)
    host = MerkleTree.build(leaves)
    from plonky2_merkle_trees_tpu import poseidon
    digests = poseidon.hash_leaves(jnp.asarray(leaves))
    cap = np.asarray(merkle_cap(digests, 2))       # 4 caps == level 5 of the tree
    np.testing.assert_array_equal(cap, host.tree[5])
    root_cap = np.asarray(merkle_cap(digests, 0))  # cap height 0 == root
    np.testing.assert_array_equal(root_cap[0], host.root)


def test_forest_root_equals_single_chip():
    assert jax.device_count() == 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(8)
    leaves = _leaves(8 * 64)
    expected = MerkleTree.build(leaves).root
    got = forest_root(jnp.asarray(leaves), mesh)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_forest_peaks_are_subtree_roots():
    mesh = make_mesh(8)
    leaves = _leaves(8 * 32)
    peaks = np.asarray(forest_peaks(jnp.asarray(leaves), mesh))
    for d in range(8):
        sub = MerkleTree.build(leaves[d * 32:(d + 1) * 32])
        np.testing.assert_array_equal(peaks[d], sub.root)


def test_forest_root_deterministic_across_runs():
    mesh = make_mesh(8)
    leaves = _leaves(8 * 16, seed=99)
    a = np.asarray(forest_root(jnp.asarray(leaves), mesh))
    b = np.asarray(forest_root(jnp.asarray(leaves), mesh))
    np.testing.assert_array_equal(a, b)


def test_gate_fold_kernel_matches_xla():
    """ops/gate_kernel.py kernel BODY (run eagerly on array-backed refs —
    the exact ops Pallas executes, minus the block plumbing) vs the XLA
    gate-term path: bit-identical alpha-folded gate terms.  The compiled
    kernel itself is covered on hardware by tests/test_pallas_tpu.py."""
    from plonky2_merkle_trees_tpu.ops import gate_kernel as gk
    from plonky2_merkle_trees_tpu.plonk.algebra import BatchAlgebra
    from plonky2_merkle_trees_tpu.plonk.vanishing import (
        eval_gate_constraints, _powers_vec)
    from plonky2_merkle_trees_tpu.plonk.gates import GATE_INDEX, NUM_SELECTORS

    m = 128
    rng = np.random.default_rng(31)
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
        assert len(gate_terms) == gk.NUM_GATE_TERMS
        expected = []
        apow_rows = []
        for a in alphas:
            pw = _powers_vec(np, np.uint64(a), gk.NUM_GATE_TERMS)
            apow_rows.append(pw)
            acc = np.zeros(m, dtype=np.uint64)
            for j, t in enumerate(gate_terms):
                acc = field.add(acc, field.mul(pw[j], t))
            expected.append(acc)

    sel4 = np.stack([sels[GATE_INDEX[g]] for g in
                     ("arithmetic", "constant", "public_input", "poseidon")])
    params = np.concatenate([pi, np.stack(apow_rows).reshape(-1)])

    def split(x):
        a = jnp.asarray(x)
        return ((a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (a >> 32).astype(jnp.uint32))

    class Out:
        def __init__(self, shape):
            self.buf = np.zeros(shape, dtype=np.uint32)

        def __setitem__(self, key, value):
            self.buf[key] = np.asarray(value)

    w_lo, w_hi = split(wires[:130])
    s_lo, s_hi = split(sel4)
    c_lo, c_hi = split(consts)
    p_lo, p_hi = split(params.reshape(1, -1))
    out_lo, out_hi = Out((2, m)), Out((2, m))
    gk._gate_fold_kernel(2)(w_lo, w_hi, s_lo, s_hi, c_lo, c_hi,
                            p_lo, p_hi, out_lo, out_hi)
    got = out_lo.buf.astype(np.uint64) | (out_hi.buf.astype(np.uint64) << 32)
    np.testing.assert_array_equal(got, np.stack(expected))


def test_ratios_kernel_matches_xla():
    """ops/perm_kernel.py kernel BODY (eager on array-backed refs) vs the
    XLA permutation-ratio path of device._stage_mono_commit: bit-identical
    ratios, including the Montgomery-batched inverse (value-unique mod p).
    The compiled kernel is covered on hardware by tests/test_pallas_tpu.py."""
    from plonky2_merkle_trees_tpu.ops import perm_kernel as pk

    n, r_wires, nc = 256, 80, 2
    num_chunks = r_wires // pk.CHUNK
    rng = np.random.default_rng(47)
    routed = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    tags = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    sigmas = rng.integers(0, field.P, size=(r_wires, n), dtype=np.uint64)
    betas = rng.integers(0, field.P, size=nc, dtype=np.uint64)
    gammas = rng.integers(0, field.P, size=nc, dtype=np.uint64)

    # XLA/numpy reference: the exact _stage_mono_commit formulation
    with np.errstate(over="ignore"):
        f_stack, g_stack = [], []
        for c in range(nc):
            f = field.add(routed, field.add(field.mul(tags, betas[c]),
                                            gammas[c]))
            g = field.add(routed, field.add(field.mul(sigmas, betas[c]),
                                            gammas[c]))
            f_stack.append(f.reshape(num_chunks, pk.CHUNK, n))
            g_stack.append(g.reshape(num_chunks, pk.CHUNK, n))
        fp, gp = np.stack(f_stack), np.stack(g_stack)
        while fp.shape[2] > 1:
            half = fp.shape[2] // 2
            fp = field.mul(fp[:, :, :half], fp[:, :, half:])
            gp = field.mul(gp[:, :, :half], gp[:, :, half:])
        expected = field.mul(fp[:, :, 0], field.inv_vec(gp[:, :, 0]))

    def split(x):
        a = jnp.asarray(x)
        return ((a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (a >> 32).astype(jnp.uint32))

    class Out:
        def __init__(self, shape):
            self.buf = np.zeros(shape, dtype=np.uint32)

        def __setitem__(self, key, value):
            self.buf[key] = np.asarray(value)

    r_lo, r_hi = split(routed)
    t_lo, t_hi = split(tags)
    s_lo, s_hi = split(sigmas)
    params = np.concatenate([betas, gammas]).reshape(1, -1)
    p_lo, p_hi = split(params)
    out_lo = Out((nc * num_chunks, n))
    out_hi = Out((nc * num_chunks, n))
    pk._ratios_kernel(nc, num_chunks)(r_lo, r_hi, t_lo, t_hi, s_lo, s_hi,
                                      p_lo, p_hi, out_lo, out_hi)
    got = (out_lo.buf.astype(np.uint64)
           | (out_hi.buf.astype(np.uint64) << 32)).reshape(nc, num_chunks, n)
    np.testing.assert_array_equal(got, expected)


def test_combined_fold_kernel_matches_xla():
    """ops/gate_kernel.py combined_fold_pallas kernel BODY (eager) vs
    vanishing.eval_combined's numpy batch path: bit-identical full combined
    constraints (gate terms + L0*(Z-1) + permutation chunk links)."""
    from plonky2_merkle_trees_tpu.ops import gate_kernel as gk
    from plonky2_merkle_trees_tpu.plonk.algebra import BatchAlgebra
    from plonky2_merkle_trees_tpu.plonk.vanishing import (
        eval_combined, _powers_vec, CHUNK)
    from plonky2_merkle_trees_tpu.plonk.gates import GATE_INDEX, NUM_SELECTORS

    m, r_wires, nc = 128, 80, 2
    num_chunks = r_wires // CHUNK
    rng = np.random.default_rng(59)
    wires = rng.integers(0, field.P, size=(135, m), dtype=np.uint64)
    sels = rng.integers(0, 2, size=(NUM_SELECTORS, m)).astype(np.uint64)
    consts = rng.integers(0, field.P, size=(2, m), dtype=np.uint64)
    sigmas = rng.integers(0, field.P, size=(r_wires, m), dtype=np.uint64)
    zs = rng.integers(0, field.P, size=(nc, m), dtype=np.uint64)
    zs_next = rng.integers(0, field.P, size=(nc, m), dtype=np.uint64)
    parts = rng.integers(0, field.P, size=(nc, num_chunks - 1, m),
                         dtype=np.uint64)
    xs = rng.integers(1, field.P, size=m, dtype=np.uint64)
    l0 = rng.integers(0, field.P, size=m, dtype=np.uint64)
    pi = rng.integers(0, field.P, size=4, dtype=np.uint64)
    betas = rng.integers(0, field.P, size=nc, dtype=np.uint64)
    gammas = rng.integers(0, field.P, size=nc, dtype=np.uint64)
    alphas = rng.integers(0, field.P, size=nc, dtype=np.uint64)
    k_is = [int(x) for x in rng.integers(1, field.P, size=r_wires,
                                         dtype=np.uint64)]

    alg = BatchAlgebra(np, m)
    with np.errstate(over="ignore"):
        expected = eval_combined(
            alg, r_wires, k_is, xs, [wires[i] for i in range(135)],
            [sels[i] for i in range(NUM_SELECTORS)], [consts[0], consts[1]],
            [sigmas[i] for i in range(r_wires)],
            [zs[c] for c in range(nc)], [zs_next[c] for c in range(nc)],
            {c: [parts[c, j] for j in range(num_chunks - 1)]
             for c in range(nc)},
            [betas[c] for c in range(nc)], [gammas[c] for c in range(nc)],
            [alphas[c] for c in range(nc)],
            [np.full(m, v, dtype=np.uint64) for v in pi], l0,
            gate_kernel=False)

    sel4 = np.stack([sels[GATE_INDEX[g]] for g in
                     ("arithmetic", "constant", "public_input", "poseidon")])
    stride = gk.NUM_GATE_TERMS + 1 + num_chunks
    apow = np.stack([_powers_vec(np, np.uint64(a), stride) for a in alphas])
    zstack = np.stack([row for c in range(nc)
                       for row in [zs[c]] + [parts[c, j] for j in
                                             range(num_chunks - 1)]
                       + [zs_next[c]]])
    params = np.concatenate([pi, apow.reshape(-1), betas, gammas])

    def split(x):
        a = jnp.asarray(x)
        return ((a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (a >> 32).astype(jnp.uint32))

    class Out:
        def __init__(self, shape):
            self.buf = np.zeros(shape, dtype=np.uint32)

        def __setitem__(self, key, value):
            self.buf[key] = np.asarray(value)

    w_lo, w_hi = split(wires[:130])
    s_lo, s_hi = split(sel4)
    c_lo, c_hi = split(consts)
    sg_lo, sg_hi = split(sigmas)
    z_lo, z_hi = split(zstack)
    x_lo, x_hi = split(np.stack([l0, xs]))
    p_lo, p_hi = split(params.reshape(1, -1))
    out_lo, out_hi = Out((nc, m)), Out((nc, m))
    k_tuple = tuple(k % field.P for k in k_is)
    gk._combined_fold_kernel(nc, num_chunks, k_tuple)(
        w_lo, w_hi, s_lo, s_hi, c_lo, c_hi, sg_lo, sg_hi, z_lo, z_hi,
        x_lo, x_hi, p_lo, p_hi, out_lo, out_hi)
    got = out_lo.buf.astype(np.uint64) | (out_hi.buf.astype(np.uint64) << 32)
    np.testing.assert_array_equal(got, np.stack(expected))


def test_hash_columns_kernel_matches_host():
    """ops/poseidon_pallas.py hash_columns kernel BODY (eager) vs
    commitment.hash_rows of the transposed matrix: bit-identical leaf
    digests (fused multi-absorb sponge + lazy internal reduction)."""
    from plonky2_merkle_trees_tpu.ops import poseidon_pallas as pp
    from plonky2_merkle_trees_tpu.plonk.commitment import hash_rows

    for r in (135, 22, 16, 8, 7, 5):
        m = 128
        rng = np.random.default_rng(100 + r)
        mat = rng.integers(0, field.P, size=(r, m), dtype=np.uint64)
        expected = hash_rows(mat.T)                        # (m, 4)

        lo = jnp.asarray(mat & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = jnp.asarray(mat >> np.uint64(32)).astype(jnp.uint32)

        class Out:
            def __init__(self, shape):
                self.buf = np.zeros(shape, dtype=np.uint32)

            def __setitem__(self, key, value):
                self.buf[key] = np.asarray(value)

        out_lo, out_hi = Out((4, m)), Out((4, m))
        pp._hash_columns_kernel(r)(lo, hi, out_lo, out_hi)
        got = (out_lo.buf.astype(np.uint64)
               | (out_hi.buf.astype(np.uint64) << 32)).T
        np.testing.assert_array_equal(got, expected, err_msg=f"r={r}")
