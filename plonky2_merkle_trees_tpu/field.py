"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic, vectorised.

TPU-first design: all operations work on ``uint64`` arrays and are written
against a generic array namespace so the same code runs under numpy (host,
no-JIT batched paths) and jax.numpy (TPU / jitted paths).  JAX's x64 mode is
enabled at package import; on TPU, XLA emulates u64 lanes as u32 pairs, and
the hot Poseidon kernel additionally has a dedicated Pallas implementation
(see ops/poseidon_pallas.py).

The multiply/reduce pipeline mirrors the classic Goldilocks recipe (the same
one plonky2's scalar implementation uses): full 64x64 -> 128-bit product via
32-bit limbs, then the 2^64 = 2^32 - 1 (mod p) folding reduction.  All public
entry points return canonical representatives in [0, p).

Capability parity with the ``GoldilocksField`` surface the reference consumes:
from_canonical_u64 / from_noncanonical_u128 / ONE / NEG_ONE / default
(reference simple_merkle_tree.rs:5,151-167, pol.rs:30).
"""

import functools

import numpy as np

from .poseidon_constants import GOLDILOCKS_P


def _wrapping(fn):
    """Silence numpy's overflow warnings: wraparound is intentional here
    (u64 arithmetic is performed mod 2^64 by construction)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)
    return wrapper

P = GOLDILOCKS_P
EPSILON = (1 << 32) - 1  # 2^64 mod p
MASK32 = (1 << 32) - 1
ZERO = 0
ONE = 1
NEG_ONE = P - 1
# Multiplicative group generator (same as plonky2's GoldilocksField::MULTIPLICATIVE_GROUP_GENERATOR)
MULTIPLICATIVE_GROUP_GENERATOR = 7
# 2-adicity: p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
TWO_ADICITY = 32
# Order-2^32 primitive root of unity: plonky2's POWER_OF_TWO_GENERATOR = 7^((p-1)/2^32) mod p
POWER_OF_TWO_GENERATOR = pow(7, (P - 1) >> 32, P)


def _xp(a):
    """Resolve the array namespace (numpy or jax.numpy) for ``a``."""
    if isinstance(a, np.ndarray) or np.isscalar(a):
        return np
    import jax.numpy as jnp
    return jnp


def to_array(values, xp=np):
    """Build a canonical uint64 field array from python ints / arrays."""
    arr = np.asarray(
        [v % P for v in values] if isinstance(values, (list, tuple)) else values,
        dtype=np.uint64,
    )
    if xp is not np:
        arr = xp.asarray(arr)
    return arr


def from_noncanonical_u128(value: int) -> int:
    """Host scalar: reduce an arbitrary 128-bit integer to canonical form."""
    return value % P


@_wrapping
def add(a, b):
    """Canonical a + b mod p (elementwise, uint64 arrays)."""
    xp = _xp(a)
    s = a + b  # wraps mod 2^64
    # Overflow (true sum >= 2^64) or non-canonical result both mean subtract p.
    need = (s < a) | (s >= xp.uint64(P))
    return xp.where(need, s - xp.uint64(P), s)


@_wrapping
def sub(a, b):
    xp = _xp(a)
    d = a - b  # wraps
    return xp.where(b > a, d + xp.uint64(P), d)


@_wrapping
def neg(a):
    xp = _xp(a)
    return xp.where(a == 0, a, xp.uint64(P) - a)


@_wrapping
def mul_wide(a, b):
    """Full 128-bit product of two u64 arrays as a (hi, lo) u64 pair."""
    xp = _xp(a)
    m32 = xp.uint64(MASK32)
    a_hi, a_lo = a >> 32, a & m32
    b_hi, b_lo = b >> 32, b & m32
    t00 = a_lo * b_lo
    t01 = a_lo * b_hi
    t10 = a_hi * b_lo
    t11 = a_hi * b_hi
    mid = t01 + t10
    carry_mid = (mid < t01).astype(xp.uint64)
    lo = t00 + ((mid & m32) << 32)
    carry_lo = (lo < t00).astype(xp.uint64)
    hi = t11 + (mid >> 32) + (carry_mid << 32) + carry_lo
    return hi, lo


@_wrapping
def reduce128(hi, lo):
    """Reduce a 128-bit value (hi*2^64 + lo) to canonical [0, p).

    Uses 2^64 = 2^32 - 1 and 2^96 = -1 (mod p):
      x = hi_hi*2^96 + hi_lo*2^64 + lo = lo - hi_hi + hi_lo*(2^32-1) (mod p).
    """
    xp = _xp(hi)
    eps = xp.uint64(EPSILON)
    hi_hi = hi >> 32
    hi_lo = hi & xp.uint64(MASK32)
    t0 = lo - hi_hi
    t0 = xp.where(lo < hi_hi, t0 - eps, t0)  # borrow: subtract 2^32-1
    t1 = hi_lo * eps
    t2 = t0 + t1
    t2 = xp.where(t2 < t0, t2 + eps, t2)  # carry: add 2^32-1
    return xp.where(t2 >= xp.uint64(P), t2 - xp.uint64(P), t2)


def mul(a, b):
    return reduce128(*mul_wide(a, b))


@_wrapping
def mul_small(a, c: int):
    """Multiply by a small (< 2^32) python-int constant, canonical result."""
    xp = _xp(a)
    cc = xp.uint64(c)
    m32 = xp.uint64(MASK32)
    lo = (a & m32) * cc           # < 2^64
    hi = (a >> 32) * cc           # < 2^64; true value = hi*2^32 + lo
    top = hi >> 32
    lo2 = lo + ((hi & m32) << 32)
    top = top + (lo2 < lo).astype(xp.uint64)
    return reduce128(top, lo2)


def square(a):
    return mul(a, a)


def exp_vec(a, e: int):
    """Vectorised a^e for a fixed host-int exponent (square-and-multiply)."""
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        xp = _xp(a)
        return xp.ones_like(a)
    return result


def inv_vec(a):
    """Vectorised inversion.

    Traced (jax) arrays: a^(p-2) — ~100 fully-parallel multiplies, no
    sequential chain (TPU-friendly).  Host numpy arrays: Montgomery batch
    inversion — 3(n-1) Python-int multiplies + ONE scalar inverse, ~100x
    the numpy powering chain for the verifier's small batches (the chain
    cost ~9 ms per 28-element call, the top profile line of
    tools/profile_verify.py).  Zeros invert to zero in both paths
    (0^(p-2) == 0 semantics)."""
    if isinstance(a, np.ndarray):
        flat = [int(v) for v in a.reshape(-1)]
        n = len(flat)
        prefix = [0] * n          # prefix[i] = product of nonzeros < i
        acc = 1
        for i, v in enumerate(flat):
            prefix[i] = acc
            if v:
                acc = acc * v % P
        inv = pow(acc, P - 2, P)
        out = [0] * n
        for i in range(n - 1, -1, -1):
            v = flat[i]
            if v:
                out[i] = prefix[i] * inv % P
                inv = inv * v % P
        return np.asarray(out, dtype=np.uint64).reshape(a.shape)
    e = P - 2
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def exp7(a):
    """x^7 — the Poseidon S-box monomial."""
    x2 = mul(a, a)
    x3 = mul(x2, a)
    x6 = mul(x3, x3)
    return mul(x6, a)


# --- host scalar helpers (python ints, used by index math / small paths) ---

def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def h_inverse(a: int) -> int:
    if a % P == 0:
        raise ZeroDivisionError("inverse of zero in Goldilocks field")
    return pow(a, P - 2, P)


def powers_host(base: int, count: int) -> np.ndarray:
    """[1, base, base^2, ...] as a host uint64 table by log-doubling —
    ~log2(count) vectorised multiplies instead of an O(count) python loop
    (the numpy prover's coset/power tables hit this at 2^20-size LDEs)."""
    out = np.ones(max(count, 1), dtype=np.uint64)
    cur = base % P
    k = 1
    with np.errstate(over="ignore"):
        while k < count:
            step = min(k, count - k)
            out[k:k + step] = mul(out[:step], np.uint64(cur))
            cur = cur * cur % P
            k += step
    return out[:count]


def prefix_prod_exclusive(a: np.ndarray) -> np.ndarray:
    """Exclusive modular prefix product: out[i] = prod_{j<i} a[j] (out[0]=1),
    via a Hillis-Steele scan — O(N log N) vectorised field muls instead of an
    O(N) python loop (the permutation argument's Z column)."""
    n = a.shape[0]
    z = np.empty(n, dtype=np.uint64)
    z[0] = 1
    z[1:] = a[:-1]
    shift = 1
    with np.errstate(over="ignore"):
        while shift < n:
            z[shift:] = mul(z[shift:], z[:-shift])
            shift <<= 1
    return z


def primitive_root_of_unity(n_log: int) -> int:
    """Order-2^n_log root of unity (host int)."""
    if n_log > TWO_ADICITY:
        raise ValueError(f"2-adicity exceeded: {n_log} > {TWO_ADICITY}")
    g = POWER_OF_TWO_GENERATOR
    for _ in range(TWO_ADICITY - n_log):
        g = (g * g) % P
    return g
