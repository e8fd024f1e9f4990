"""Fused Pallas TPU kernel for the Poseidon-Goldilocks permutation.

Why a kernel: XLA's u64 emulation spends ~3-4x the necessary u32 lane-ops
per field multiply and re-canonicalises aggressively.  Here every Goldilocks
element is an explicit (hi, lo) u32 pair laid out structure-of-arrays —
shape (12, N) per limb with the batch N on the 128-wide lane axis — and the
whole 30-round permutation is unrolled with the round constants embedded as
immediates (no constant loads at all).

Arithmetic notes (all plain u32 VPU ops):

* 64x64 -> 128-bit multiply: 16-bit limb decomposition, 16 (10 for squares)
  u32 partial products, split-accumulated column sums (each bounded < 2^19),
  explicit carry chain -> eight 16-bit output chunks.
* reduction: 2^64 = 2^32 - 1 (mod p) folding, identical math to field.py's
  reduce128 but on u32 pairs.
* MDS layer: circulant matrix with 6-bit entries — each output lane is an
  exact u32 accumulation of const * 16-bit-limb products (bound 264*65535 <
  2^25), reassembled with one short carry chain; the 2^64-overflow term is a
  single 16-bit value so the fold is one conditional subtract + add.

The kernel is bit-exact with poseidon.permute / permute_host (tested against
the reference's golden tree vectors).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..poseidon_constants import (
    WIDTH, N_ROUNDS, HALF_FULL_ROUNDS, PARTIAL_ROUNDS,
    MDS_MATRIX_CIRC, MDS_MATRIX_DIAG, all_round_constants,
)

_RC = all_round_constants()
_M16 = 0xFFFF

_MDS_ROW0 = [MDS_MATRIX_CIRC[c] + (MDS_MATRIX_DIAG[0] if c == 0 else 0)
             for c in range(WIDTH)]  # row r uses circ[(c-r)%12]


def _u32(x):
    return x.astype(jnp.uint32)


# -- u32-pair (hi, lo) Goldilocks primitives --------------------------------

def _fold_epsilon(hi, lo, over):
    """Where ``over`` (the 2^64 carry bit) is set, add epsilon = 2^32-1
    (i.e. lo -= 1 with a carry into hi unless lo was 0); result < p, so no
    further canonicalisation needed on that path."""
    carry = _u32((over > 0) & (lo != 0))
    lo = jnp.where(over > 0, lo - jnp.uint32(1), lo)
    hi = jnp.where(over > 0, hi + carry, hi)
    return hi, lo


def _canonicalise(hi, lo):
    """Subtract p once if >= p (only possible when hi == 0xFFFFFFFF)."""
    ge_p = (hi == jnp.uint32(0xFFFFFFFF)) & (lo >= jnp.uint32(1))
    hi = jnp.where(ge_p, jnp.uint32(0), hi)
    lo = jnp.where(ge_p, lo - jnp.uint32(1), lo)
    return hi, lo


def _add64(a, b):
    """(a_hi,a_lo) + (b_hi,b_lo) canonical mod p; inputs canonical."""
    a_hi, a_lo = a
    b_hi, b_lo = b
    lo = a_lo + b_lo
    carry = _u32(lo < a_lo)
    s1 = a_hi + b_hi
    c1 = _u32(s1 < a_hi)
    hi = s1 + carry
    over = c1 | _u32(hi < s1)
    return _canonicalise(*_fold_epsilon(hi, lo, over))


def _add64_const(a, c_hi: int, c_lo: int):
    """a + compile-time constant (canonical), canonical result."""
    a_hi, a_lo = a
    lo = a_lo + jnp.uint32(c_lo)
    carry = _u32(lo < a_lo) if c_lo else jnp.uint32(0)
    s1 = a_hi + jnp.uint32(c_hi)
    c1 = _u32(s1 < a_hi) if c_hi else jnp.uint32(0)
    hi = s1 + carry
    over = c1 | _u32(hi < s1)
    return _canonicalise(*_fold_epsilon(hi, lo, over))


def _limbs(a):
    """(hi, lo) u32 pair -> four 16-bit limbs (as u32)."""
    hi, lo = a
    return (lo & jnp.uint32(_M16), lo >> 16, hi & jnp.uint32(_M16), hi >> 16)


def _reduce_chunks_lazy(r):
    """Eight 16-bit chunks (little-endian) -> (hi, lo) u32 pair that is
    value-correct mod p and < 2^64, but NOT canonicalised (may lie in
    [p, 2^64)).  Safe as input to every primitive here: the 16-bit limb
    decomposition and the 128-bit reduction are exact for any u64, and the
    t0+t1 fold's carry math was bounded for arbitrary <2^64 operands
    (s <= 2^64 - 2^33, so the epsilon-fold cannot re-overflow).  One final
    _canonicalise at a value's last use restores the canonical form."""
    lo_lo = r[0] | (r[1] << 16)
    lo_hi = r[2] | (r[3] << 16)
    hi_lo = r[4] | (r[5] << 16)
    hi_hi = r[6] | (r[7] << 16)
    # t0 = lo64 - hi_hi (64-bit), with epsilon correction on borrow
    b0 = _u32(lo_lo < hi_hi)
    t0_lo = lo_lo - hi_hi
    t0_hi = lo_hi - b0
    borrow = _u32(lo_hi < b0)
    # borrow => t0 -= epsilon (2^32-1) i.e. t0 += 1 - 2^32: lo += 1, hi -= 1
    t0_lo2 = t0_lo + jnp.uint32(1)
    c = _u32(t0_lo2 == 0)
    t0_lo = jnp.where(borrow > 0, t0_lo2, t0_lo)
    t0_hi = jnp.where(borrow > 0, t0_hi - jnp.uint32(1) + c, t0_hi)
    # t1 = hi_lo * epsilon = (hi_lo << 32) - hi_lo
    t1_hi = hi_lo - _u32(hi_lo != 0)
    t1_lo = jnp.uint32(0) - hi_lo
    # t2 = t0 + t1 with carry-out => += epsilon
    s_lo = t0_lo + t1_lo
    c1 = _u32(s_lo < t0_lo)
    s1 = t0_hi + t1_hi
    ca = _u32(s1 < t0_hi)
    s_hi = s1 + c1
    over = ca | _u32(s_hi < s1)
    return _fold_epsilon(s_hi, s_lo, over)


def _reduce_chunks(r):
    """Eight 16-bit chunks (little-endian) -> canonical (hi, lo) u32 pair."""
    return _canonicalise(*_reduce_chunks_lazy(r))


def _carry_chain(cols_lo, cols_hi):
    """Column sums (7 positions, split 16/16) -> eight 16-bit chunks."""
    chunks = []
    carry = jnp.uint32(0)
    for k in range(8):
        t = carry
        if k < 7:
            t = t + cols_lo[k]
        if 0 < k <= 7:
            t = t + cols_hi[k - 1]
        chunks.append(t & jnp.uint32(_M16))
        carry = t >> 16
    return chunks


def _mul_cols(a, b):
    """Column sums of the 16-bit-limb product (shared mul plumbing).
    Exact for ANY u64 operands (canonical or lazy)."""
    al = _limbs(a)
    bl = _limbs(b)
    cols_lo = [jnp.uint32(0)] * 7
    cols_hi = [jnp.uint32(0)] * 7
    for i in range(4):
        for j in range(4):
            p = al[i] * bl[j]
            k = i + j
            cols_lo[k] = cols_lo[k] + (p & jnp.uint32(_M16))
            cols_hi[k] = cols_hi[k] + (p >> 16)
    return cols_lo, cols_hi


def _sqr_cols(a):
    """Symmetric partial products halve the multiplies."""
    al = _limbs(a)
    cols_lo = [jnp.uint32(0)] * 7
    cols_hi = [jnp.uint32(0)] * 7
    for i in range(4):
        p = al[i] * al[i]
        cols_lo[2 * i] = cols_lo[2 * i] + (p & jnp.uint32(_M16))
        cols_hi[2 * i] = cols_hi[2 * i] + (p >> 16)
        for j in range(i + 1, 4):
            p = al[i] * al[j]
            k = i + j
            two_lo = (p & jnp.uint32(_M16)) << 1
            two_hi = (p >> 16) << 1
            cols_lo[k] = cols_lo[k] + two_lo
            cols_hi[k] = cols_hi[k] + two_hi
    return cols_lo, cols_hi


def _mul64(a, b):
    """Full canonical product of two (hi, lo) u32 pairs (any u64 inputs)."""
    return _reduce_chunks(_carry_chain(*_mul_cols(a, b)))


def _sqr64(a):
    """Canonical square."""
    return _reduce_chunks(_carry_chain(*_sqr_cols(a)))


def _mul64_lazy(a, b):
    """Product, value-correct mod p and < 2^64 but possibly in [p, 2^64)."""
    return _reduce_chunks_lazy(_carry_chain(*_mul_cols(a, b)))


def _sqr64_lazy(a):
    return _reduce_chunks_lazy(_carry_chain(*_sqr_cols(a)))


def _exp7(a):
    x2 = _sqr64_lazy(a)
    x3 = _mul64_lazy(x2, a)
    x6 = _sqr64_lazy(x3)
    return _mul64(x6, a)


def _exp7_lazy(a):
    x2 = _sqr64_lazy(a)
    x3 = _mul64_lazy(x2, a)
    x6 = _sqr64_lazy(x3)
    return _mul64_lazy(x6, a)


def _mds(state):
    """MDS layer over 12 (hi, lo) pairs; returns new list of pairs."""
    limbs = [_limbs(s) for s in state]  # 12 x 4 (u32<=2^16)
    out = []
    for r in range(WIDTH):
        acc = [jnp.uint32(0)] * 4
        for c in range(WIDTH):
            m = MDS_MATRIX_CIRC[(c - r) % WIDTH] + (MDS_MATRIX_DIAG[r] if c == r else 0)
            mm = jnp.uint32(m)
            for k in range(4):
                acc[k] = acc[k] + mm * limbs[c][k]
        # acc[k] < 264 * 65535 < 2^25.  Reassemble into 16-bit chunks:
        chunks = []
        carry = jnp.uint32(0)
        for k in range(4):
            t = acc[k] + carry
            chunks.append(t & jnp.uint32(_M16))
            carry = t >> 16
        # carry < 2^16: the value is lo64 + carry * 2^64
        chunks += [carry & jnp.uint32(_M16), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)]
        # chunks[4] is the 2^64 coefficient: route through the same reducer by
        # treating it as hi_lo (chunks 4..5) with hi_hi = 0.
        out.append(_reduce_chunks(chunks))
    return out


def _add64_const_lazy(a, c_hi: int, c_lo: int):
    """a (< 2^64, lazy ok) + canonical compile-time constant; lazy result.

    Safe for non-canonical a: a + c < 2^64 + p, so on 64-bit carry the
    epsilon-fold lands strictly below 2^64 and cannot re-overflow."""
    a_hi, a_lo = a
    lo = a_lo + jnp.uint32(c_lo)
    carry = _u32(lo < a_lo) if c_lo else jnp.uint32(0)
    s1 = a_hi + jnp.uint32(c_hi)
    c1 = _u32(s1 < a_hi) if c_hi else jnp.uint32(0)
    hi = s1 + carry
    over = c1 | _u32(hi < s1)
    return _fold_epsilon(hi, lo, over)


def _mds_lazy(state):
    """MDS layer with a specialised small-overflow reduction: the 2^64
    coefficient is the single <2^16 carry of the chunk reassembly, so
    value = lo64 + carry*epsilon needs one subtract/add pair + one
    epsilon-fold instead of the full 128-bit reduction.  Lazy (<2^64,
    possibly non-canonical) in and out; exact mod p for any u64 inputs."""
    limbs = [_limbs(s) for s in state]
    out = []
    for r in range(WIDTH):
        acc = [jnp.uint32(0)] * 4
        for c in range(WIDTH):
            m = MDS_MATRIX_CIRC[(c - r) % WIDTH] + (MDS_MATRIX_DIAG[r] if c == r else 0)
            mm = jnp.uint32(m)
            for k in range(4):
                acc[k] = acc[k] + mm * limbs[c][k]
        chunks = []
        carry = jnp.uint32(0)
        for k in range(4):
            t = acc[k] + carry
            chunks.append(t & jnp.uint32(_M16))
            carry = t >> 16
        lo_lo = chunks[0] | (chunks[1] << 16)
        lo_hi = chunks[2] | (chunks[3] << 16)
        # + carry * epsilon = + (carry << 32) - carry
        b = _u32(lo_lo < carry)
        s_lo = lo_lo - carry
        s_hi = lo_hi + (carry - b)     # carry-b >= 0: b=1 implies carry>=1
        over = _u32(s_hi < lo_hi)
        out.append(_fold_epsilon(s_hi, s_lo, over))
    return out


def _permute_body(state, canonical_out: bool = True):
    """Full 30-round permutation over 12 (hi, lo) pairs with LAZY internal
    reduction (values stay exact mod p, representatives may lie in
    [p, 2^64)); ``canonical_out`` canonicalises the final state.  Inputs
    may themselves be lazy — every primitive here accepts any u64."""
    rnd = 0
    for phase, count in ((0, HALF_FULL_ROUNDS), (1, PARTIAL_ROUNDS),
                         (0, HALF_FULL_ROUNDS)):
        for _ in range(count):
            base = 12 * rnd
            state = [
                _add64_const_lazy(s, _RC[base + i] >> 32,
                                  _RC[base + i] & 0xFFFFFFFF)
                for i, s in enumerate(state)
            ]
            if phase == 0:
                state = [_exp7_lazy(s) for s in state]
            else:
                state[0] = _exp7_lazy(state[0])
            state = _mds_lazy(state)
            rnd += 1
    if canonical_out:
        state = [_canonicalise(*s) for s in state]
    return state


def _poseidon_kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    state = [(hi_ref[i, :], lo_ref[i, :]) for i in range(WIDTH)]
    state = _permute_body(state)
    for i in range(WIDTH):
        out_hi_ref[i, :] = state[i][0]
        out_lo_ref[i, :] = state[i][1]


@partial(jax.jit, static_argnames=("block",))
def permute_pallas(states, block: int = 1024):
    """Poseidon permutation of (N, 12) uint64 states via the Pallas kernel.

    N is padded up to a multiple of ``block`` internally.
    """
    n = states.shape[0]
    n_pad = -(-n // block) * block
    padded = jnp.zeros((n_pad, WIDTH), dtype=jnp.uint64)
    padded = padded.at[:n].set(states)
    x = padded.T  # (12, N)
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> 32).astype(jnp.uint32)

    grid = (n_pad // block,)
    # NB: with jax x64 enabled, python-int literals in index maps trace as
    # i64, which Mosaic rejects — pin them to int32.
    spec = pl.BlockSpec((WIDTH, block), lambda i: (np.int32(0), i),
                        memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        _poseidon_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((WIDTH, n_pad), jnp.uint32)] * 2,
    )(lo, hi)

    result = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
    return result.T[:n]


@partial(jax.jit, static_argnames=("block",))
def two_to_one_pallas(left, right, block: int = 1024):
    """Batched two_to_one on (N, 4) digests via the Pallas permutation."""
    n = left.shape[0]
    state = jnp.concatenate(
        [left, right, jnp.zeros((n, 4), dtype=jnp.uint64)], axis=-1)
    return permute_pallas(state, block=block)[:, :4]


# -- fused sponge: hash_n_to_4 over columns of a poly-major matrix ----------

def _hash_columns_kernel(num_rows: int):
    """Kernel body: each lane is one leaf; absorb the num_rows elements of
    its column in RATE-sized chunks (hash_n_to_hash_no_pad), state held in
    registers across ALL absorbs — no per-absorb u64<->u32 conversion, no
    leaf-major transpose of the input, lazy reduction throughout with one
    final canonicalisation of the digest lanes."""
    from ..poseidon_constants import RATE

    def kernel(in_lo, in_hi, out_lo, out_hi):
        zero = jnp.zeros_like(in_lo[0, :])
        state = [(zero, zero)] * WIDTH
        for start in range(0, num_rows, RATE):
            for i in range(min(RATE, num_rows - start)):
                state[i] = (in_hi[start + i, :], in_lo[start + i, :])
            state = _permute_body(state, canonical_out=False)
        for i in range(4):
            hi, lo = _canonicalise(*state[i])
            out_hi[i, :] = hi
            out_lo[i, :] = lo

    return kernel


@partial(jax.jit, static_argnames=("block", "interpret"))
def hash_columns_pallas(matrix, block: int = 1024, interpret: bool = False):
    """hash_or_noop of every COLUMN of a (R, m) u64 matrix -> (4, m) u64.

    This is the Merkle leaf hash in the LDE's natural poly-major layout
    (each column = one leaf row of the commitment), fusing the whole
    R/8-absorb sponge into one kernel.  R must be > 4 (the noop path stays
    with the caller); m must be a multiple of ``block``.  Bit-exact with
    poseidon.hash_rows of the transposed matrix."""
    r, m = int(matrix.shape[0]), int(matrix.shape[1])
    assert r > 4, r
    assert m % block == 0, (m, block)
    lo = (matrix & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (matrix >> 32).astype(jnp.uint32)
    grid = (m // block,)
    z = np.int32(0)

    def row_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (z, i),
                            memory_space=pltpu.VMEM)

    out_lo, out_hi = pl.pallas_call(
        _hash_columns_kernel(r),
        grid=grid,
        in_specs=[row_spec(r)] * 2,
        out_specs=[row_spec(4)] * 2,
        out_shape=[jax.ShapeDtypeStruct((4, m), jnp.uint32)] * 2,
        interpret=interpret,
    )(lo, hi)
    return out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << 32)
