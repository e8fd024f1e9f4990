"""Fused Pallas TPU kernels for batched Goldilocks NTTs (the LDE core).

Why a kernel: the XLA u64 path in plonk/ntt.py runs one full HBM pass per
butterfly stage and pays XLA's u64-emulation overhead on every field multiply
— measured 141 ms for the flagship's 135-poly 2^15→2^18 coset LDE, ~22x the
HBM-bandwidth floor (BASELINE.md "P1 per-op roofline").  Here the transform
is restructured as the classic four-step NTT so ALL butterflies run on
VMEM-resident tiles:

    x (B, N) → view (R, C), rows i1, cols i2   [i = i1*C + i2]
    1. column NTT of size R for every column   → C1[k1][i2]   (kernel 1)
    2. elementwise twiddle  C1 · w_N^(k1·i2)                  (kernel 1)
    3. transpose → (C, R)                                     (XLA)
    4. column NTT of size C for every column   → M2[k2][k1]   (kernel 2)
    5. flatten: out[k1 + R·k2] = M2[k2][k1]  — natural order, no final
       permutation needed.

Each column NTT is decimation-in-time over the SUBLANE axis with the lane
axis as batch; a butterfly stage is two sublane rolls + one masked field
multiply + add/sub — no reshapes, so Mosaic never relayouts, and every
stage touches only VMEM.  The two bit-reversals DIT needs are cheap XLA
row-gathers (axis=-2) between kernels.  Field arithmetic is the same
explicit (hi, lo)-u32-pair / 16-bit-limb pipeline as the Poseidon kernel
(ops/poseidon_pallas.py), bit-exact with field.py.

The result is exactly plonk/ntt.py's ntt()/intt() (same math, same
canonical outputs), so prover transcripts are unchanged; ntt.py dispatches
here automatically for TPU-traced arrays of supported sizes.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import field
from .poseidon_pallas import _mul64, _add64, _u32

# Transform sizes handled per kernel: R (sublane axis) needs >= 8 rows and
# the lane axis a multiple of 128, and one (R, Ct) u32 tile should stay
# well under VMEM, so N in [2^10, 2^22] with a balanced split.
MIN_LOG_N = 10
MAX_LOG_N = 22
_TILE_ELEMS = 1 << 17          # R * Ct cap: 0.5 MB per u32 plane

# Tests flip this to run the kernels under the Pallas interpreter on CPU.
_INTERPRET = False


def _sub64(a, b):
    """(a - b) mod p on canonical (hi, lo) u32 pairs; canonical result."""
    a_hi, a_lo = a
    b_hi, b_lo = b
    lo = a_lo - b_lo
    bor = _u32(a_lo < b_lo)
    hi1 = a_hi - b_hi
    hi = hi1 - bor
    under = _u32(a_hi < b_hi) | _u32(hi1 < bor)
    # wrapped result is a - b + 2^64; want a - b + p = wrapped - epsilon
    lo2 = lo + jnp.uint32(1)                      # lo - 0xFFFFFFFF (wrapped)
    hi2 = hi - _u32(lo2 != 0)
    lo = jnp.where(under > 0, lo2, lo)
    hi = jnp.where(under > 0, hi2, hi)
    return hi, lo


def _split_rc(log_n: int):
    """Balanced (R, C) split with C a multiple of 128 (lane axis)."""
    c_log = max(7, log_n // 2)
    return 1 << (log_n - c_log), 1 << c_log


@lru_cache(maxsize=None)
def _bitrev(n: int) -> np.ndarray:
    log = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log):
        rev |= ((idx >> b) & 1) << (log - 1 - b)
    return rev


def _stage_rows_host(transform_n: int, inverse: bool) -> np.ndarray:
    """(S, R) per-row DIT twiddles: stage s (half h = 2^s) row r uses
    w_{2h}^(r mod h).  Host numpy, tiny (<= 2048 rows)."""
    log = transform_n.bit_length() - 1
    out = np.empty((log, transform_n), dtype=np.uint64)
    for s in range(log):
        h = 1 << s
        w = field.primitive_root_of_unity(s + 1)
        if inverse:
            w = field.h_inverse(w)
        tw = np.empty(h, dtype=np.uint64)
        acc = 1
        for j in range(h):
            tw[j] = acc
            acc = acc * w % field.P
        out[s] = np.tile(tw, transform_n // h)
    return out


@lru_cache(maxsize=None)
def _twmat_host(log_n: int, inverse: bool) -> np.ndarray:
    """(R, C) four-step twiddle matrix w_N^(k1*i2), with 1/N folded in for
    the inverse transform.  Built with vectorised field ops (C columns of
    cumulative products)."""
    r, c = _split_rc(log_n)
    w = field.primitive_root_of_unity(log_n)
    if inverse:
        w = field.h_inverse(w)
    col = np.ones(r, dtype=np.uint64)
    base = field.powers_host(w, r)        # w^k1 for k1 < R
    if inverse:
        n_inv = field.h_inverse(1 << log_n)
        col = np.full(r, np.uint64(n_inv))
    mat = np.empty((r, c), dtype=np.uint64)
    mat[:, 0] = col
    for j in range(1, c):
        col = field.mul(col, base)
        mat[:, j] = col
    return mat


def _hi(x):
    return (x >> np.uint64(32)).astype(np.uint32) if isinstance(x, np.ndarray) \
        else (x >> jnp.uint64(32)).astype(jnp.uint32)


def _lo(x):
    m = np.uint64(0xFFFFFFFF) if isinstance(x, np.ndarray) else jnp.uint64(0xFFFFFFFF)
    return (x & m).astype(np.uint32) if isinstance(x, np.ndarray) \
        else (x & m).astype(jnp.uint32)


def _col_ntt_kernel(n_stages: int, use_mat: bool,
                    hi_ref, lo_ref, tws_hi_ref, tws_lo_ref,
                    *rest):
    """One grid step: column DIT-NTT over the sublane axis of a (1, R, Ct)
    block (input rows pre-bit-reversed), optionally followed by the
    four-step twiddle-matrix multiply."""
    if use_mat:
        mat_hi_ref, mat_lo_ref, out_hi_ref, out_lo_ref = rest
    else:
        out_hi_ref, out_lo_ref = rest
    hi = hi_ref[0]
    lo = lo_ref[0]
    rows = hi.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    for s in range(n_stages):
        h = 1 << s
        mask = (row_ids & jnp.uint32(h)) == 0
        dn = np.int32(rows - h)                      # int32: Mosaic's
        up = np.int32(h)                             # rotate amount type
        down_hi = pltpu.roll(hi, dn, axis=0)         # row r -> x[r+h]
        down_lo = pltpu.roll(lo, dn, axis=0)
        up_hi = pltpu.roll(hi, up, axis=0)           # row r -> x[r-h]
        up_lo = pltpu.roll(lo, up, axis=0)
        b_hi = jnp.where(mask, down_hi, hi)
        b_lo = jnp.where(mask, down_lo, lo)
        if s == 0:
            t = (b_hi, b_lo)                      # stage-0 twiddles are all 1
        else:
            tw = (tws_hi_ref[:, s:s + 1], tws_lo_ref[:, s:s + 1])
            t = _mul64(tw, (b_hi, b_lo))
        a = (jnp.where(mask, hi, up_hi), jnp.where(mask, lo, up_lo))
        add = _add64(a, t)
        sub = _sub64(a, t)
        hi = jnp.where(mask, add[0], sub[0])
        lo = jnp.where(mask, add[1], sub[1])
    if use_mat:
        hi, lo = _mul64((mat_hi_ref[...], mat_lo_ref[...]), (hi, lo))
    out_hi_ref[0] = hi
    out_lo_ref[0] = lo


def _col_ntt(x_hi, x_lo, tws, mat):
    """Column NTT over axis -2 of (B, R, C) u32-pair arrays (rows already
    bit-reversed); mat is an optional (R, C) u64 twiddle matrix."""
    b, r, c = x_hi.shape
    ct = c
    while r * ct > _TILE_ELEMS and ct > 128:
        ct //= 2
    grid = (b, c // ct)
    blk = pl.BlockSpec((1, r, ct), lambda i, j: (i, np.int32(0), j),
                       memory_space=pltpu.VMEM)
    twb = pl.BlockSpec(tws[0].shape, lambda i, j: (np.int32(0), np.int32(0)),
                       memory_space=pltpu.VMEM)
    in_specs = [blk, blk, twb, twb]
    args = [x_hi, x_lo, tws[0], tws[1]]
    if mat is not None:
        matb = pl.BlockSpec((r, ct), lambda i, j: (np.int32(0), j),
                            memory_space=pltpu.VMEM)
        in_specs += [matb, matb]
        args += [_hi(mat), _lo(mat)]
    n_stages = r.bit_length() - 1
    return pl.pallas_call(
        partial(_col_ntt_kernel, n_stages, mat is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((b, r, c), jnp.uint32)] * 2,
        # at N=2^20 XLA elects to keep the full (b, r, c) u32 outputs in
        # scoped VMEM (they fit individually); raise the per-kernel cap so
        # that choice plus the double-buffered tiles doesn't OOM the 16 MB
        # default scoped limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)


def _stage_tables(transform_n: int, inverse: bool):
    """(S_padded-lane (R, 16)) hi/lo u32 stage-twiddle tables as device
    constants (tiny: <= 2048 x 16 x 8 bytes)."""
    tws = _stage_rows_host(transform_n, inverse)          # (S, R) u64
    # lane axis must hold the per-stage index; keep it small and static
    arr = np.zeros((transform_n, max(tws.shape[0], 1)), dtype=np.uint64)
    arr[:, :tws.shape[0]] = tws.T
    return jnp.asarray(_hi(arr)), jnp.asarray(_lo(arr))


def supported(n: int) -> bool:
    log_n = n.bit_length() - 1
    return (1 << log_n) == n and MIN_LOG_N <= log_n <= MAX_LOG_N


def ntt_pallas(values, inverse: bool = False):
    """Batched NTT over the last axis via the four-step Pallas pipeline.

    values: (..., N) uint64 traced array on TPU.  Bit-exact with
    plonk/ntt.py's ntt()/intt() (natural-order output, canonical values).
    """
    n = int(values.shape[-1])
    log_n = n.bit_length() - 1
    if not supported(n):
        raise ValueError(f"ntt_pallas: unsupported size {n}")
    r, c = _split_rc(log_n)
    pre = values.shape[:-1]
    x = values.reshape((-1, r, c))

    # hi/lo split once; all moves between kernels stay on u32 planes
    x_hi, x_lo = _hi(x), _lo(x)

    rev_r = jnp.asarray(_bitrev(r))
    x_hi = jnp.take(x_hi, rev_r, axis=1)
    x_lo = jnp.take(x_lo, rev_r, axis=1)
    m1_hi, m1_lo = _col_ntt(x_hi, x_lo, _stage_tables(r, inverse),
                            _twmat_host(log_n, inverse))

    m1_hi = jnp.swapaxes(m1_hi, 1, 2)
    m1_lo = jnp.swapaxes(m1_lo, 1, 2)
    rev_c = jnp.asarray(_bitrev(c))
    m1_hi = jnp.take(m1_hi, rev_c, axis=1)
    m1_lo = jnp.take(m1_lo, rev_c, axis=1)
    m2_hi, m2_lo = _col_ntt(m1_hi, m1_lo, _stage_tables(c, inverse), None)

    out = m2_hi.astype(jnp.uint64) << jnp.uint64(32) | m2_lo.astype(jnp.uint64)
    # out matrix is M2[k2][k1]; flatten gives out[k1 + R*k2] — natural order
    return out.reshape(pre + (n,))
