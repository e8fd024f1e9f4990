"""Fused Pallas TPU kernel for the permutation-argument ratios (P1).

The commit program's second hot block (after the wire commit) builds the
permutation-argument running products: for each challenge set c and each
CHUNK-sized group j of routed wires,

    f[i]      = routed[i] + beta_c * tags[i]   + gamma_c
    g[i]      = routed[i] + beta_c * sigmas[i] + gamma_c
    ratios[c, j] = (prod_{i in chunk j} f[i]) / (prod_{i in chunk j} g[i])

On the XLA u64 path this is ~80M emulated field multiplies plus an
exponentiation-based inverse per (c, chunk, point) — ~24 ms of the P1
program at the flagship shape (tools/profile_p1.py row E).  This kernel
evaluates the whole block in explicit (hi, lo) u32-pair arithmetic on the
VPU and replaces the 2*num_chunks inversions per point with ONE inversion
per challenge set via the Montgomery batch trick across chunks (prefix
products + a single addition-chain x^(p-2), then a backward sweep).

Bit-exactness: the modular inverse is value-unique, products are
reassociated only across associative mod-p multiplication, and every
output is canonicalised by the final multiply — so the emitted ratios (and
therefore every committed Z row and all proof transcripts) are bit-identical
to the XLA path (tests/test_device_ops.py::test_ratios_kernel_matches_xla).

Zero caveat (shared with every batch-inversion implementation, including
the one plonky2 uses): if some g chunk-product is 0 (probability ~2^-64
per point under random beta/gamma), the batch trick zeroes the other
inverses that share its prefix; the XLA path would zero only that chunk.
Either way the proof is invalid and rejected downstream — no soundness
impact, and no fixed test vector exercises it.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poseidon_pallas import _add64, _mul64, _sqr64

CHUNK = 8  # mirrors plonk.vanishing.CHUNK (routed-wire factors per product)


def _inv64(a):
    """x^(p-2) for p = 2^64 - 2^32 + 1 on a canonical (hi, lo) pair.

    Addition-chain on t_k = x^(2^k - 1):  p - 2 = (2^31 - 1)*2^33 + 2^32 - 1,
    so inv = t31^(2^33) * t32.  90 squarings + 10 multiplies — ~40% fewer
    lane-ops than plain square-and-multiply on the 63-bit exponent.
    """
    def shift_mul(t, k, s):
        # t^(2^k) * s
        for _ in range(k):
            t = _sqr64(t)
        return _mul64(t, s)

    t1 = a
    t2 = shift_mul(t1, 1, t1)     # 2^2 - 1
    t3 = shift_mul(t2, 1, t1)     # 2^3 - 1
    t4 = shift_mul(t2, 2, t2)     # 2^4 - 1
    t7 = shift_mul(t4, 3, t3)     # 2^7 - 1
    t8 = shift_mul(t4, 4, t4)     # 2^8 - 1
    t15 = shift_mul(t8, 7, t7)    # 2^15 - 1
    t16 = shift_mul(t8, 8, t8)    # 2^16 - 1
    t31 = shift_mul(t16, 15, t15)  # 2^31 - 1
    t32 = shift_mul(t16, 16, t16)  # 2^32 - 1
    t = t31
    for _ in range(33):
        t = _sqr64(t)
    return _mul64(t, t32)


def _fg_chunk_products(wire, off, beta, gamma, num_chunks):
    """Chunk products of w + beta*off + gamma over rows grouped by CHUNK.

    ``wire``/``off`` are callables row -> (hi, lo); returns a list of
    num_chunks (hi, lo) pairs.  Product order is pairwise-halved, matching
    device._stage_mono_commit's fold (associative mod p — value-identical
    to any order)."""
    prods = []
    for j in range(num_chunks):
        vals = []
        for i in range(CHUNK * j, CHUNK * (j + 1)):
            vals.append(_add64(wire(i), _add64(_mul64(off(i), beta), gamma)))
        while len(vals) > 1:
            half = len(vals) // 2
            vals = [_mul64(vals[k], vals[half + k]) for k in range(half)]
        prods.append(vals[0])
    return prods


def _ratios_kernel(nc: int, num_chunks: int):
    def kernel(r_lo, r_hi, t_lo, t_hi, s_lo, s_hi, p_lo, p_hi,
               out_lo, out_hi):
        def param(k):
            return (p_hi[0, k], p_lo[0, k])

        def routed(i):
            return (r_hi[i, :], r_lo[i, :])

        for c in range(nc):
            beta, gamma = param(c), param(nc + c)
            f_prod = _fg_chunk_products(
                routed, lambda i: (t_hi[i, :], t_lo[i, :]), beta, gamma,
                num_chunks)
            g_prod = _fg_chunk_products(
                routed, lambda i: (s_hi[i, :], s_lo[i, :]), beta, gamma,
                num_chunks)
            # Montgomery batch inversion across the chunk axis
            prefix = [g_prod[0]]
            for j in range(1, num_chunks):
                prefix.append(_mul64(prefix[-1], g_prod[j]))
            t = _inv64(prefix[-1])
            inv_g = [None] * num_chunks
            for j in range(num_chunks - 1, 0, -1):
                inv_g[j] = _mul64(t, prefix[j - 1])
                t = _mul64(t, g_prod[j])
            inv_g[0] = t
            for j in range(num_chunks):
                hi, lo = _mul64(f_prod[j], inv_g[j])
                out_hi[c * num_chunks + j, :] = hi
                out_lo[c * num_chunks + j, :] = lo

    return kernel


def _split(x):
    return ((x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> 32).astype(jnp.uint32))


def perm_kernel_on(xp=None) -> bool:
    """Auto-dispatch: traced execution on a TPU backend (single device —
    the caller gates on mesh).  PMT_PERM_KERNEL=1 forces (interpret mode
    off-TPU, for CPU parity tests), =0 disables."""
    import os
    flag = os.environ.get("PMT_PERM_KERNEL", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("block", "interpret"))
def ratios_pallas(routed, tags, sigmas, betas, gammas,
                  block: int = 2048, interpret: bool = False):
    """Permutation-argument chunk ratios, fused.

    routed/tags/sigmas: (R, n) u64 with R a multiple of CHUNK;
    betas/gammas: (nc,) u64 challenge vectors.
    Returns (nc, R // CHUNK, n) u64 — bit-identical to
    f_prod * inv_vec(g_prod) on the XLA path.
    """
    r_wires, n = int(routed.shape[0]), int(routed.shape[1])
    nc = int(betas.shape[0])
    assert r_wires % CHUNK == 0, r_wires
    num_chunks = r_wires // CHUNK
    assert n % block == 0, (n, block)

    r_lo, r_hi = _split(routed)
    t_lo, t_hi = _split(tags)
    s_lo, s_hi = _split(sigmas)
    params = jnp.concatenate([betas.reshape(-1),
                              gammas.reshape(-1)]).reshape(1, -1)
    p_lo, p_hi = _split(params)
    n_params = int(params.shape[1])

    grid = (n // block,)
    z = np.int32(0)  # int32 literals: x64 python ints trace as i64 in maps

    def row_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (z, i),
                            memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, n_params), lambda i: (z, z),
                             memory_space=pltpu.SMEM)
    out_rows = nc * num_chunks
    out_lo, out_hi = pl.pallas_call(
        _ratios_kernel(nc, num_chunks),
        grid=grid,
        in_specs=[row_spec(r_wires)] * 6 + [smem_spec] * 2,
        out_specs=[row_spec(out_rows)] * 2,
        out_shape=[jax.ShapeDtypeStruct((out_rows, n), jnp.uint32)] * 2,
        interpret=interpret,
    )(r_lo, r_hi, t_lo, t_hi, s_lo, s_hi, p_lo, p_hi)

    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
    return out.reshape(nc, num_chunks, n)
