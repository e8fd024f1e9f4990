"""Radix-2 NTT / LDE over Goldilocks — the prover's FLOP core.

Iterative decimation-in-time with host-precomputed twiddle tables and a
bit-reversal gather; every butterfly stage is one full vectorised pass, so
the whole transform is log2(N) batched field operations — XLA-friendly, no
data-dependent control flow (SURVEY.md §2.2 row "LDE via radix-2 NTT").

Works on numpy and jax arrays alike (via field.py's generic ops); supports a
leading batch dimension so all wire polynomials transform in one launch.
"""

from functools import lru_cache

import numpy as np

from .. import field


@lru_cache(maxsize=None)
def _bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables: stage s uses w_{2^(s+1)}^j, j < 2^s."""
    tables = []
    for s in range(log_n):
        m = 1 << (s + 1)
        w = field.primitive_root_of_unity(s + 1)
        if inverse:
            w = field.h_inverse(w)
        tw = np.empty(m // 2, dtype=np.uint64)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = acc * w % field.P
        tables.append(tw)
    return tuple(tables)


def ntt(values, inverse: bool = False):
    """NTT over the size-N multiplicative subgroup; (..., N) uint64 array.

    Forward: coefficients -> evaluations at powers of the order-N root g
    (natural order: out[i] = poly(g^i)).  ``inverse=True`` inverts.
    """
    xp = field._xp(values)
    n = int(values.shape[-1])
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError(f"NTT size {n} is not a power of two")
    if log_n == 0:
        return values

    rev = _bit_reverse_indices(log_n)
    x = values[..., xp.asarray(rev)]
    for s in range(log_n):
        half = 1 << s
        tw = xp.asarray(_twiddles(log_n, inverse)[s])
        y = x.reshape(values.shape[:-1] + (n // (2 * half), 2, half))
        a = y[..., 0, :]
        b = field.mul(y[..., 1, :], tw)
        x = xp.concatenate([field.add(a, b)[..., None, :],
                            field.sub(a, b)[..., None, :]], axis=-2)
        x = x.reshape(values.shape[:-1] + (n,))
    if inverse:
        n_inv = field.h_inverse(n)
        x = field.mul(x, xp.asarray(np.uint64(n_inv)))
    return x


def intt(values):
    return ntt(values, inverse=True)


def coset_lde(coeffs, rate_bits: int, shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR):
    """Low-degree extension: evaluate the degree-<N polynomial on the coset
    ``shift * H`` of the size ``N << rate_bits`` subgroup (plonky2 coset_fft
    with shift g = 7).  (..., N) -> (..., N << rate_bits)."""
    xp = field._xp(coeffs)
    n = int(coeffs.shape[-1])
    big_n = n << rate_bits
    # scale coefficients by shift^i, then zero-pad
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = acc * shift % field.P
    scaled = field.mul(coeffs, xp.asarray(powers))
    padded = xp.zeros(coeffs.shape[:-1] + (big_n,), dtype=xp.uint64)
    if xp is np:
        padded[..., :n] = scaled
    else:
        padded = padded.at[..., :n].set(scaled)
    return ntt(padded)


def coset_intt(evals, rate_bits_unused: int = 0,
               shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR):
    """Inverse of evaluation on a coset: recover coefficients from values on
    ``shift * H`` (H of the same size as the input)."""
    xp = field._xp(evals)
    n = int(evals.shape[-1])
    coeffs = intt(evals)
    inv_shift = field.h_inverse(shift)
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = acc * inv_shift % field.P
    return field.mul(coeffs, xp.asarray(powers))


def evaluate_poly(coeffs, x: int) -> int:
    """Horner evaluation of a host coefficient vector at a host scalar."""
    acc = 0
    for c in reversed([int(v) for v in np.asarray(coeffs)]):
        acc = (acc * x + c) % field.P
    return acc
