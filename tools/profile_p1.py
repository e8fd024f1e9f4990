"""Per-op microbenchmark of the device prover's P1 (commit) program —
fills BASELINE.md's roofline table (VERDICT r1 #9).

P1 at the flagship shape (degree n=2^15, LDE m=2^18, 135 wires, 80
routed, nc=2) decomposes into:

  A  wire gather (V[g] masked)                      (135, 2^15) from V
  B  INTT of the wire matrix                        135 x 2^15
  C  coset-LDE (zero-pad + coset NTT)               135 x 2^15 -> 2^18
  D  Merkle levels of the LDE (leaf hash 17 absorbs + reduce to cap 4)
  E  permutation ratios + inv_vec + chunk products  (2, chunks, 2^15)
  F  Z prefix products (associative scan)           2 x 2^15
  G  zsp commit (INTT+LDE+tree of ~20 rows)

Run on the real chip:  python tools/profile_p1.py
Each block is jitted separately and timed warm (chained iterations with a
final device->host fetch, like bench.py).
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
from plonky2_merkle_trees_tpu.plonk.device import _merkle_levels

DEGREE_BITS = 15
RATE_BITS = 3
NUM_WIRES = 135
R_WIRES = 80
CAP_HEIGHT = 4
NC = 2


def timeit(label, fn, *args, iters=5, fetch=lambda out: out):
    out = fn(*args)
    # force true completion: block_until_ready under-reports through the
    # remote-TPU tunnel (and compiles there can overlap the first calls) —
    # a device->host fetch is the only reliable barrier
    np.asarray(fetch(out))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(fetch(out))
    dt = (time.perf_counter() - start) / iters
    print(f"{label:48s} {dt*1000:9.2f} ms")
    return dt


def main():
    n = 1 << DEGREE_BITS
    m = n << RATE_BITS
    rng = np.random.default_rng(0)
    wires = jnp.asarray(rng.integers(0, field.P, size=(NUM_WIRES, n),
                                     dtype=np.uint64))
    print(f"backend={jax.default_backend()} n=2^{DEGREE_BITS} m=2^{DEGREE_BITS+RATE_BITS}")

    intt_fn = jax.jit(nttmod.intt)
    coeffs = intt_fn(wires)
    timeit("B  intt 135 x 2^15", intt_fn, wires,
           fetch=lambda o: o[0, :4])

    lde_fn = jax.jit(lambda c: nttmod.coset_lde(c, RATE_BITS))
    lde = lde_fn(coeffs)
    timeit("C  coset_lde 135 x 2^15 -> 2^18", lde_fn, coeffs,
           fetch=lambda o: o[0, :4])

    tree_fn = jax.jit(lambda v: _merkle_levels(v.T, CAP_HEIGHT))
    timeit("D  merkle levels (2^18 leaves x 135 cols)", tree_fn, lde,
           fetch=lambda o: o[-1], iters=3)

    # D split: leaf hashing alone vs the reduce levels
    from plonky2_merkle_trees_tpu.plonk.device import _hash_rows_device
    leaf_fn = jax.jit(lambda v: _hash_rows_device(v.T))
    timeit("D1 leaf hashing alone (17 absorbs x 2^18)", leaf_fn, lde,
           fetch=lambda o: o[0], iters=3)

    # D alt: transpose cost alone
    tr_fn = jax.jit(lambda v: v.T + jnp.uint64(0))
    timeit("D0 transpose (135, 2^18) -> (2^18, 135)", tr_fn, lde,
           fetch=lambda o: o[0, :4])

    # E  permutation ratios: mul/add over (80, 2^15) x nc + inv_vec
    tags = jnp.asarray(rng.integers(0, field.P, size=(R_WIRES, n),
                                    dtype=np.uint64))
    sigmas = jnp.asarray(rng.integers(0, field.P, size=(R_WIRES, n),
                                      dtype=np.uint64))

    def ratios_fn(routed, tags, sigmas):
        from plonky2_merkle_trees_tpu.plonk.vanishing import CHUNK
        num_chunks = R_WIRES // CHUNK
        f_stack, g_stack = [], []
        for c in range(NC):
            beta = jnp.uint64(7 + c)
            gamma = jnp.uint64(11 + c)
            f = field.add(routed, field.add(field.mul(tags, beta), gamma))
            g = field.add(routed, field.add(field.mul(sigmas, beta), gamma))
            f_stack.append(f.reshape(num_chunks, CHUNK, n))
            g_stack.append(g.reshape(num_chunks, CHUNK, n))
        fp = jnp.stack(f_stack)
        gp = jnp.stack(g_stack)
        while fp.shape[2] > 1:
            half = fp.shape[2] // 2
            fp = field.mul(fp[:, :, :half], fp[:, :, half:])
            gp = field.mul(gp[:, :, :half], gp[:, :, half:])
        return field.mul(fp[:, :, 0], field.inv_vec(gp[:, :, 0]))

    rfn = jax.jit(ratios_fn)
    ratios = rfn(wires[:R_WIRES], tags, sigmas)
    timeit("E  permutation ratios + inv_vec", rfn,
           wires[:R_WIRES], tags, sigmas, fetch=lambda o: o[0, 0, :4])

    scan_fn = jax.jit(lambda r: jax.lax.associative_scan(field.mul, r))
    timeit("F  associative scan 2^15", scan_fn, ratios[0, 0],
           fetch=lambda o: o[:4])

    # E' fused Pallas ratios kernel (ops/perm_kernel.py) — live prover path
    if jax.default_backend() == "tpu":
        from plonky2_merkle_trees_tpu.ops.perm_kernel import ratios_pallas
        betas = jnp.asarray(np.array([7, 8], dtype=np.uint64))
        gammas = jnp.asarray(np.array([11, 12], dtype=np.uint64))
        kfn = jax.jit(ratios_pallas)
        timeit("E' ratios_pallas kernel", kfn, wires[:R_WIRES], tags,
               sigmas, betas, gammas, fetch=lambda o: o[0, 0, :4])

        # D' fused column-hash leaf kernel (no transpose, lazy reduction)
        from plonky2_merkle_trees_tpu.ops.poseidon_pallas import (
            hash_columns_pallas)
        hfn = jax.jit(hash_columns_pallas)
        timeit("D' hash_columns_pallas (135 x 2^18)", hfn, lde,
               fetch=lambda o: o[0, :4], iters=3)
        from plonky2_merkle_trees_tpu.plonk.device import _merkle_levels_cols
        tfn = jax.jit(lambda v: _merkle_levels_cols(v, CAP_HEIGHT))
        timeit("D'' merkle levels via column kernel", tfn, lde,
               fetch=lambda o: o[-1], iters=3)

    # A  wire gather
    V = jnp.asarray(rng.integers(0, field.P, size=(1 << 18,),
                                 dtype=np.uint64))
    K = jnp.asarray(rng.integers(0, 2, size=(1 << 18,)).astype(bool))
    g_np = rng.integers(-1, 1 << 18, size=(NUM_WIRES, n)).astype(np.int32)
    gmap = jnp.asarray(g_np)

    def gather_fn(V, K, wm):
        g = jnp.maximum(wm, 0)
        filled = (wm >= 0) & K[g]
        return jnp.where(filled, V[g], jnp.uint64(0))

    gfn = jax.jit(gather_fn)
    timeit("A  wire gather (135 x 2^15)", gfn, V, K, gmap,
           fetch=lambda o: o[0, :4])


if __name__ == "__main__":
    main()
