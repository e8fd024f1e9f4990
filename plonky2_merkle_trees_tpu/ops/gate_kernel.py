"""Fused Pallas TPU kernel for the quotient stage's gate-constraint fold.

The P2 (quotient) program's dominant op is evaluating every gate's
constraints over all m = 8N domain points and folding them with powers of
alpha (BASELINE.md P2 roofline: 92 ms of the 185 ms program on the XLA u64
path).  This kernel computes, for each challenge set c,

    G_c(x) = sum_j alpha_c^j * sel_{gate(j)}(x) * constraint_j(x)

over the full gate-term range j = 0..131 (registry order: arithmetic 0..7,
constant 8..9, public_input 10..13, poseidon 14..131 — vanishing.py's
protocol-normative enumeration), in explicit (hi, lo) u32-pair Goldilocks
arithmetic on the VPU.  The Poseidon block evaluates the partial-round
recurrence SEQUENTIALLY (22 small-constant MDS passes) exactly like
gates.PoseidonGate._eval_batch — same canonical mod-p values, ~3x fewer
lane ops than XLA's u64 emulation and no re-canonicalisation churn.

Bit-exactness: every primitive is the same canonical arithmetic as
field.py / gates.py; selector distribution (sel * sum == sum of sel*term)
and summation reassociation are exact mod p, so the combined-constraint
values — and therefore all proof transcripts — are unchanged
(tests/test_device_ops.py::test_gate_fold_kernel_matches_xla, interpret
mode; tests/test_pallas_tpu.py on the real chip).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..poseidon_constants import (
    WIDTH, HALF_FULL_ROUNDS, PARTIAL_ROUNDS, all_round_constants,
)
from .poseidon_pallas import (
    _add64, _add64_const, _exp7, _mds, _mul64, _u32,
)

_RC = all_round_constants()

NUM_GATE_TERMS = 132          # 8 arith + 2 const + 4 PI + 118 poseidon
POSEIDON_WIRES = 130

# wire-layout offsets (gates.py PoseidonGate)
_IN, _OUT, _S1, _S2, _S3, _PR = 0, 12, 24, 36, 48, 60
_S26, _S27, _S28, _S29 = 82, 94, 106, 118


def _sub64(a, b):
    """Canonical (hi, lo) subtraction mod p; inputs canonical.

    On 64-bit borrow the true value is a - b + 2^64; subtracting
    epsilon = 2^32 - 1 yields a - b + p, which is canonical."""
    a_hi, a_lo = a
    b_hi, b_lo = b
    lo = a_lo - b_lo
    bor1 = _u32(a_lo < b_lo)
    h1 = a_hi - b_hi
    bor2 = _u32(a_hi < b_hi)
    hi = h1 - bor1
    borrow = (bor2 | _u32(h1 < bor1)) > 0
    # t -= epsilon: lo += 1 (mod 2^32) with borrow into hi unless lo was max
    lo_max = lo == jnp.uint32(0xFFFFFFFF)
    new_lo = jnp.where(borrow, lo + jnp.uint32(1), lo)
    new_hi = jnp.where(borrow & ~lo_max, hi - jnp.uint32(1), hi)
    return new_hi, new_lo


def _eval_gate_terms(wire, fold, flush, c0, c1, param):
    """The 132 selector-grouped gate terms (registry order), shared between
    the gate-only fold kernel and the full combined-constraint kernel.

    ``wire(i)``/``param(k)`` return (hi, lo) pairs; ``fold(cons)`` folds one
    constraint with the next alpha power; ``flush(sel_row)`` multiplies the
    accumulated group by its selector row."""
    # --- arithmetic gate: 8 slots of o - (c0*x*y + c1*z) -------------
    for s in range(8):
        x, y, z, o = (wire(4 * s + i) for i in range(4))
        expected = _add64(_mul64(c0, _mul64(x, y)), _mul64(c1, z))
        fold(_sub64(o, expected))
    flush(0)

    # --- constant gate: wires[0..2) - constants ----------------------
    fold(_sub64(wire(0), c0))
    fold(_sub64(wire(1), c1))
    flush(1)

    # --- public-input gate: wires[0..4) - pi_hash --------------------
    for i in range(4):
        fold(_sub64(wire(i), param(i)))
    flush(2)

    # --- poseidon gate (118 constraints, gates.py _eval_batch order) -
    def rc(r, i):
        v = _RC[12 * r + i]
        return v >> 32, v & 0xFFFFFFFF

    def full_round_check(base, prev7, rc_row):
        exp = _mds(prev7)
        for i in range(WIDTH):
            exp_i = _add64_const(exp[i], *rc(rc_row, i))
            fold(_sub64(wire(base + i), exp_i))

    t = [_exp7(_add64_const(wire(_IN + i), *rc(0, i)))
         for i in range(WIDTH)]
    full_round_check(_S1, t, 1)
    s1_7 = [_exp7(wire(_S1 + i)) for i in range(WIDTH)]
    full_round_check(_S2, s1_7, 2)
    s2_7 = [_exp7(wire(_S2 + i)) for i in range(WIDTH)]
    full_round_check(_S3, s2_7, 3)

    # partial phase: sequential 22-step recurrence
    s3_7 = [_exp7(wire(_S3 + i)) for i in range(WIDTH)]
    state = _mds(s3_7)
    state = [_add64_const(st, *rc(HALF_FULL_ROUNDS, i))
             for i, st in enumerate(state)]
    for k in range(PARTIAL_ROUNDS):
        fold(_sub64(wire(_PR + k), state[0]))
        pr7 = _exp7(wire(_PR + k))
        state = _mds([pr7] + state[1:])
        state = [_add64_const(st, *rc(HALF_FULL_ROUNDS + k + 1, i))
                 for i, st in enumerate(state)]
    for i in range(WIDTH):
        fold(_sub64(wire(_S26 + i), state[i]))

    s26_7 = [_exp7(wire(_S26 + i)) for i in range(WIDTH)]
    full_round_check(_S27, s26_7, 27)
    s27_7 = [_exp7(wire(_S27 + i)) for i in range(WIDTH)]
    full_round_check(_S28, s27_7, 28)
    s28_7 = [_exp7(wire(_S28 + i)) for i in range(WIDTH)]
    full_round_check(_S29, s28_7, 29)
    s29_7 = [_exp7(wire(_S29 + i)) for i in range(WIDTH)]
    out = _mds(s29_7)
    for i in range(WIDTH):
        fold(_sub64(wire(_OUT + i), out[i]))
    flush(3)


def _gate_fold_kernel(nc: int):
    """Build the kernel body for a static number of challenge sets."""

    def kernel(w_lo, w_hi, s_lo, s_hi, c_lo, c_hi, p_lo, p_hi,
               out_lo, out_hi):
        # params layout: [pi_hash(4), apow[c=0][0..131], apow[c=1][...], ...]
        def param(k):
            return (p_hi[0, k], p_lo[0, k])

        def wire(i):
            return (w_hi[i, :], w_lo[i, :])

        zero = jnp.zeros_like(w_lo[0, :])
        acc = [(zero, zero) for _ in range(nc)]
        part = [(zero, zero) for _ in range(nc)]
        state_idx = [0]  # running gate-term index

        def fold(cons):
            j = state_idx[0]
            for c in range(nc):
                part[c] = _add64(part[c], _mul64(param(4 + c * NUM_GATE_TERMS + j), cons))
            state_idx[0] = j + 1

        def flush(sel_row):
            sel = (s_hi[sel_row, :], s_lo[sel_row, :])
            for c in range(nc):
                acc[c] = _add64(acc[c], _mul64(sel, part[c]))
                part[c] = (zero, zero)

        c0 = (c_hi[0, :], c_lo[0, :])
        c1 = (c_hi[1, :], c_lo[1, :])
        _eval_gate_terms(wire, fold, flush, c0, c1, param)

        for c in range(nc):
            out_hi[c, :] = acc[c][0]
            out_lo[c, :] = acc[c][1]

    return kernel


def _combined_fold_kernel(nc: int, num_chunks: int, k_is: tuple):
    """Kernel body for the FULL combined constraint C_c: the 132 gate terms
    (position weights alpha^0..131) plus the permutation-argument tail —
    L0*(Z-1) at position 132 and the chunk links at 133..132+num_chunks —
    exactly vanishing.eval_combined's enumeration.  k_is (the coset-shift
    constants of the wire tags k_i * x) are baked as immediates.

    zst rows per challenge c: [zs_c, partials_c[0..chunks-2], zs_next_c].
    """
    from .perm_kernel import CHUNK

    n_tail = 1 + num_chunks

    def kernel(w_lo, w_hi, s_lo, s_hi, c_lo, c_hi, sg_lo, sg_hi,
               z_lo, z_hi, x_lo, x_hi, p_lo, p_hi, out_lo, out_hi):
        # params: [pi_hash(4), apow[c][0..131+n_tail] per c, betas, gammas]
        stride = NUM_GATE_TERMS + n_tail

        def param(k):
            return (p_hi[0, k], p_lo[0, k])

        def wire(i):
            return (w_hi[i, :], w_lo[i, :])

        def zrow(c, k):
            return (z_hi[c * (num_chunks + 1) + k, :],
                    z_lo[c * (num_chunks + 1) + k, :])

        zero = jnp.zeros_like(w_lo[0, :])
        acc = [(zero, zero) for _ in range(nc)]
        part = [(zero, zero) for _ in range(nc)]
        state_idx = [0]

        def fold(cons):
            j = state_idx[0]
            for c in range(nc):
                part[c] = _add64(part[c], _mul64(param(4 + c * stride + j),
                                                 cons))
            state_idx[0] = j + 1

        def flush(sel_row):
            sel = (s_hi[sel_row, :], s_lo[sel_row, :])
            for c in range(nc):
                acc[c] = _add64(acc[c], _mul64(sel, part[c]))
                part[c] = (zero, zero)

        c0 = (c_hi[0, :], c_lo[0, :])
        c1 = (c_hi[1, :], c_lo[1, :])
        _eval_gate_terms(wire, fold, flush, c0, c1, param)

        # --- permutation tail ---------------------------------------
        # l0 and x ride the same (2, block) ref
        l0 = (x_hi[0, :], x_lo[0, :])
        x = (x_hi[1, :], x_lo[1, :])
        one = (zero, jnp.ones_like(w_lo[0, :]))
        # k_i * x once, shared across challenge sets
        kx = [_mul64((jnp.full_like(zero, k >> 32),
                      jnp.full_like(zero, k & 0xFFFFFFFF)), x)
              for k in k_is]
        base = 4 + NUM_GATE_TERMS  # apow tail offset within a c-stride
        for c in range(nc):
            beta = param(4 + nc * stride + c)
            gamma = param(4 + nc * stride + nc + c)
            # position 132: L0 * (Z_c - 1)
            z0 = _mul64(l0, _sub64(zrow(c, 0), one))
            acc[c] = _add64(acc[c], _mul64(param(c * stride + base), z0))
            # positions 133..: nxt*g_prod - prev*f_prod per chunk
            for j in range(num_chunks):
                f_vals, g_vals = [], []
                for i in range(CHUNK * j, CHUNK * (j + 1)):
                    t = _add64(_mul64(kx[i], beta), gamma)
                    f_vals.append(_add64(wire(i), t))
                    t = _add64(_mul64((sg_hi[i, :], sg_lo[i, :]), beta),
                               gamma)
                    g_vals.append(_add64(wire(i), t))
                while len(f_vals) > 1:
                    half = len(f_vals) // 2
                    f_vals = [_mul64(f_vals[k], f_vals[half + k])
                              for k in range(half)]
                    g_vals = [_mul64(g_vals[k], g_vals[half + k])
                              for k in range(half)]
                prev = zrow(c, j)                      # zs_c or partial j-1
                nxt = zrow(c, j + 1)                   # partial j or zs_next
                link = _sub64(_mul64(nxt, g_vals[0]),
                              _mul64(prev, f_vals[0]))
                acc[c] = _add64(acc[c], _mul64(
                    param(c * stride + base + 1 + j), link))

        for c in range(nc):
            out_hi[c, :] = acc[c][0]
            out_lo[c, :] = acc[c][1]

    return kernel


def _split(x):
    return ((x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> 32).astype(jnp.uint32))


@partial(jax.jit, static_argnames=("block", "interpret"))
def gate_terms_fold_pallas(wires130, sel4, const2, pi_hash, apow,
                           block: int = 512, interpret: bool = False):
    """Folded gate terms G_c = sum_j apow[c, j] * sel_{gate(j)} * cons_j.

    wires130: (130, m) u64 wire LDE rows (PoseidonGate wire span);
    sel4:     (4, m) selector rows [arithmetic, constant, public_input,
              poseidon] (registry order minus the constraint-free noop);
    const2:   (2, m) gate-constant rows; pi_hash: (4,) u64;
    apow:     (nc, 132) u64 = alpha_c^j for gate-term positions j.
    Returns (nc, m) u64.  m must be a multiple of ``block``.
    """
    nc = int(apow.shape[0])
    m = int(wires130.shape[1])
    assert m % block == 0, (m, block)

    w_lo, w_hi = _split(wires130)
    s_lo, s_hi = _split(sel4)
    c_lo, c_hi = _split(const2)
    params = jnp.concatenate([pi_hash.reshape(-1),
                              apow.reshape(-1)]).reshape(1, -1)
    p_lo, p_hi = _split(params)
    n_params = int(params.shape[1])

    grid = (m // block,)
    # int32 literals in index maps: x64 python ints trace as i64, which
    # Mosaic rejects (see ops/poseidon_pallas.py)
    z = np.int32(0)

    def row_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (z, i),
                            memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, n_params), lambda i: (z, z),
                             memory_space=pltpu.SMEM)
    out_lo, out_hi = pl.pallas_call(
        _gate_fold_kernel(nc),
        grid=grid,
        in_specs=[row_spec(POSEIDON_WIRES)] * 2 + [row_spec(4)] * 2
                 + [row_spec(2)] * 2 + [smem_spec] * 2,
        out_specs=[row_spec(nc)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nc, m), jnp.uint32)] * 2,
        interpret=interpret,
    )(w_lo, w_hi, s_lo, s_hi, c_lo, c_hi, p_lo, p_hi)

    return out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)


@partial(jax.jit, static_argnames=("k_is", "block", "interpret"))
def combined_fold_pallas(wires130, sel4, const2, sigmas, zstack, l0_x,
                         pi_hash, apow, betas, gammas, k_is: tuple,
                         block: int = 1024, interpret: bool = False):
    """The FULL combined constraint C_c in one fused pass: alpha-folded gate
    terms plus the permutation-argument tail (L0*(Z-1) and the R/CHUNK
    partial-product chunk links) — vanishing.eval_combined's exact
    enumeration and values (reassociated only across mod-p associative ops).

    wires130: (130, m); sel4: (4, m); const2: (2, m); sigmas: (R, m) routed
    sigma rows; zstack: (nc*(chunks+1), m) rows [zs_c, partials_c..,
    zs_next_c] per challenge set; l0_x: (2, m) rows [L0, x]; pi_hash: (4,);
    apow: (nc, 132+1+chunks) alpha powers; betas/gammas: (nc,);
    k_is: static tuple of the R coset-shift constants (reduced mod p).
    Returns (nc, m) u64.
    """
    nc = int(apow.shape[0])
    m = int(wires130.shape[1])
    r_wires = int(sigmas.shape[0])
    num_chunks = r_wires // 8
    assert m % block == 0, (m, block)
    assert int(apow.shape[1]) == NUM_GATE_TERMS + 1 + num_chunks

    w_lo, w_hi = _split(wires130)
    s_lo, s_hi = _split(sel4)
    c_lo, c_hi = _split(const2)
    sg_lo, sg_hi = _split(sigmas)
    z_lo, z_hi = _split(zstack)
    x_lo, x_hi = _split(l0_x)
    params = jnp.concatenate([pi_hash.reshape(-1), apow.reshape(-1),
                              betas.reshape(-1),
                              gammas.reshape(-1)]).reshape(1, -1)
    p_lo, p_hi = _split(params)
    n_params = int(params.shape[1])

    grid = (m // block,)
    z = np.int32(0)

    def row_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (z, i),
                            memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, n_params), lambda i: (z, z),
                             memory_space=pltpu.SMEM)
    out_lo, out_hi = pl.pallas_call(
        _combined_fold_kernel(nc, num_chunks, k_is),
        grid=grid,
        in_specs=[row_spec(POSEIDON_WIRES)] * 2 + [row_spec(4)] * 2
                 + [row_spec(2)] * 2 + [row_spec(r_wires)] * 2
                 + [row_spec(nc * (num_chunks + 1))] * 2
                 + [row_spec(2)] * 2 + [smem_spec] * 2,
        out_specs=[row_spec(nc)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nc, m), jnp.uint32)] * 2,
        interpret=interpret,
    )(w_lo, w_hi, s_lo, s_hi, c_lo, c_hi, sg_lo, sg_hi, z_lo, z_hi,
      x_lo, x_hi, p_lo, p_hi)

    return out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
