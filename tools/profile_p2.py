"""Per-op microbenchmark of the device prover's P2 (quotient) program —
extends BASELINE.md's roofline table beyond P1.

P2 at the flagship shape (degree n=2^15, LDE m=2^18, 135 wires, 80 routed,
nc=2, 5 selectors) decomposes into (plonk/device.py:_stage_quotient):

  A  vanishing prep: Z_H(x), L0(x) — exp_vec + 2 inv_vec over (m,)
  B  gate constraints (eval_gate_constraints, Poseidon gate dominates):
     118 degree-7 constraints over (12..22, m) stacks
  C  permutation chunk terms + alpha-Horner (rest of _eval_combined_batch)
  D  quotient coset_intt        nc x 2^18
  E  quotient coset_lde         16 x 2^15 -> 2^18
  F  Merkle levels of the LDE   (2^18 leaves x 16 cols)

Run on the real chip:  python tools/profile_p2.py
Timing methodology matches tools/profile_p1.py (device->host fetch as the
completion barrier; block_until_ready under-reports through the tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import plonky2_merkle_trees_tpu  # noqa: F401
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
from plonky2_merkle_trees_tpu.plonk.algebra import BatchAlgebra
from plonky2_merkle_trees_tpu.plonk.device import _merkle_levels
from plonky2_merkle_trees_tpu.plonk.vanishing import (
    CHUNK, eval_combined, eval_gate_constraints)
from plonky2_merkle_trees_tpu.plonk.gates import NUM_SELECTORS

DEGREE_BITS = 15
RATE_BITS = 3
NUM_WIRES = 135
R_WIRES = 80
CAP_HEIGHT = 4
NC = 2


def timeit(label, fn, *args, iters=5, fetch=lambda out: out):
    out = fn(*args)
    np.asarray(fetch(out))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(fetch(out))
    dt = (time.perf_counter() - start) / iters
    print(f"{label:52s} {dt*1000:9.2f} ms")
    return dt


def main():
    n = 1 << DEGREE_BITS
    m = n << RATE_BITS
    num_chunks = R_WIRES // CHUNK
    rng = np.random.default_rng(0)

    def rand(*shape):
        return jnp.asarray(rng.integers(0, field.P, size=shape,
                                        dtype=np.uint64))

    print(f"backend={jax.default_backend()} n=2^{DEGREE_BITS} "
          f"m=2^{DEGREE_BITS + RATE_BITS}")

    sel = rand(NUM_SELECTORS, m)
    consts = rand(2, m)
    sigmas = rand(R_WIRES, m)
    wires = rand(NUM_WIRES, m)
    zs = rand(NC, m)
    partials = rand(NC, num_chunks - 1, m)
    xs = rand(m)
    pi_hash = rand(4)
    k_is = [int(v) for v in
            rng.integers(1, field.P, size=R_WIRES, dtype=np.uint64)]
    betas, gammas, alphas = rand(NC), rand(NC), rand(NC)

    # A  vanishing prep
    def prep_fn(xs):
        zh = field.sub(field.exp_vec(xs, n), np.uint64(1))
        l0 = field.mul(zh, field.inv_vec(
            field.mul_small(field.sub(xs, np.uint64(1)), n % field.P)))
        return zh, field.inv_vec(zh), l0

    timeit("A  Z_H + L0 (exp_vec + 2 inv_vec over 2^18)",
           jax.jit(prep_fn), xs, fetch=lambda o: o[0][:4])

    # B  gate constraints alone
    def gates_fn(sel, wires, consts, pi_hash):
        alg = BatchAlgebra(jnp, m)
        pi_alg = [jnp.broadcast_to(pi_hash[i], (m,)) for i in range(4)]
        terms = eval_gate_constraints(
            alg, [sel[i] for i in range(NUM_SELECTORS)],
            [wires[i] for i in range(NUM_WIRES)],
            [consts[i] for i in range(2)], pi_alg)
        return jnp.stack(terms)

    timeit("B  gate constraints (118+ terms, Poseidon-heavy)",
           jax.jit(gates_fn), sel, wires, consts, pi_hash,
           fetch=lambda o: o[0, :4])

    # B+C  full eval_combined
    def comb_fn(sel, wires, consts, sigmas, zs, partials, xs, pi_hash,
                betas, gammas, alphas):
        alg = BatchAlgebra(jnp, m)
        pi_alg = [jnp.broadcast_to(pi_hash[i], (m,)) for i in range(4)]
        rate = 1 << RATE_BITS
        zs_rows = [zs[c] for c in range(NC)]
        zs_next = [jnp.roll(z, -rate) for z in zs_rows]
        part = {c: [partials[c, j] for j in range(num_chunks - 1)]
                for c in range(NC)}
        zh = field.sub(field.exp_vec(xs, n), np.uint64(1))
        l0 = field.mul(zh, field.inv_vec(
            field.mul_small(field.sub(xs, np.uint64(1)), n % field.P)))
        out = eval_combined(
            alg, R_WIRES, k_is, xs, [wires[i] for i in range(NUM_WIRES)],
            [sel[i] for i in range(NUM_SELECTORS)],
            [consts[i] for i in range(2)],
            [sigmas[i] for i in range(R_WIRES)], zs_rows, zs_next, part,
            [betas[c] for c in range(NC)], [gammas[c] for c in range(NC)],
            [alphas[c] for c in range(NC)], pi_alg, l0)
        return jnp.stack(out)

    timeit("B+C+A  eval_combined whole (incl. prep)",
           jax.jit(comb_fn), sel, wires, consts, sigmas, zs, partials, xs,
           pi_hash, betas, gammas, alphas, fetch=lambda o: o[0, :4])

    # D  quotient coset_intt (nc x 2^18)
    comb = rand(NC, m)
    timeit("D  coset_intt 2 x 2^18",
           jax.jit(lambda c: nttmod.coset_intt(c)), comb,
           fetch=lambda o: o[0, :4])

    # E  quotient coset_lde 16 x 2^15 -> 2^18
    qc = rand(NC * (1 << RATE_BITS), n)
    lde_fn = jax.jit(lambda c: nttmod.coset_lde(c, RATE_BITS))
    q_lde = lde_fn(qc)
    timeit("E  coset_lde 16 x 2^15 -> 2^18", lde_fn, qc,
           fetch=lambda o: o[0, :4])

    # F  Merkle levels of the quotient LDE
    timeit("F  merkle levels (2^18 leaves x 16 cols)",
           jax.jit(lambda v: _merkle_levels(v.T, CAP_HEIGHT)), q_lde,
           fetch=lambda o: o[-1], iters=3)


if __name__ == "__main__":
    main()
