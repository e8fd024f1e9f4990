"""Radix-2 NTT / LDE over Goldilocks — the prover's FLOP core.

Iterative decimation-in-time with host-precomputed twiddle tables and a
bit-reversal gather; every butterfly stage is one full vectorised pass, so
the whole transform is log2(N) batched field operations — XLA-friendly, no
data-dependent control flow (SURVEY.md §2.2 row "LDE via radix-2 NTT").

Works on numpy and jax arrays alike (via field.py's generic ops); supports a
leading batch dimension so all wire polynomials transform in one launch.
"""

import os
from functools import lru_cache

import numpy as np

from .. import field


def _pallas_backend() -> bool:
    """True when traced arrays live on a TPU and the fused Pallas NTT
    (ops/ntt_pallas.py) should take over: it runs all butterfly stages on
    VMEM-resident tiles instead of one HBM pass per stage (bit-exact with
    the XLA path below, so transcripts are unchanged)."""
    if os.environ.get("PMT_NTT_PALLAS", "1") == "0":
        return False
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - jax always importable here
        return False


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


def _powers_on_device(xp, base: int, count: int):
    """[1, base, base^2, ...] built on device by log-doubling (the base is a
    host constant, so this is ~log2(count) vector multiplies).  Used in
    traced code instead of baking count-sized tables as XLA constants — a
    degree-2^15 prover program otherwise carries tens of MB of dense
    twiddle/power literals, which breaks remote compile helpers."""
    powers = xp.ones((1,), dtype=xp.uint64)
    cur = base % field.P
    k = 1
    while k < count:
        step = min(k, count - k)
        powers = xp.concatenate(
            [powers, field.mul(powers[:step], xp.uint64(cur))])
        cur = cur * cur % field.P
        k += step
    return powers


def _bit_reverse_on_device(xp, log_n: int):
    n = 1 << log_n
    idx = xp.arange(n, dtype=xp.int64)
    rev = xp.zeros(n, dtype=xp.int64)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev


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

    if xp is not np and _pallas_backend():
        from ..ops import ntt_pallas
        if ntt_pallas.supported(n):
            return ntt_pallas.ntt_pallas(values, inverse)

    if xp is np:
        rev = _bit_reverse_indices(log_n)
        stage_tw = lambda s: xp.asarray(_twiddles(log_n, inverse)[s])  # noqa: E731
    else:
        # traced path: build tables on device (stage-s twiddles are a
        # strided slice of the full root-power table)
        rev = _bit_reverse_on_device(xp, log_n)
        g = field.primitive_root_of_unity(log_n)
        if inverse:
            g = field.h_inverse(g)
        full = _powers_on_device(xp, g, max(n // 2, 1))
        stage_tw = lambda s: full[::n >> (s + 1)][:1 << s]             # noqa: E731

    x = values[..., rev if xp is np else xp.asarray(rev)]
    pre = values.shape[:-1]
    # radix-4 passes win for BATCHED transforms (the prover's (polys, N)
    # shapes: fewer memory-bound passes, measured P1 0.60->0.52s) but lose
    # on single vectors (2^20 1-D: 41ms radix-2 vs 55ms radix-4 — XLA
    # fuses the 2-way concat better there), so gate on a batch dim.
    use_radix4 = len(pre) >= 1
    s = 0
    while s < log_n:
        half = 1 << s
        if use_radix4 and log_n - s >= 2:
            # radix-4 pass: two fused radix-2 stages — same exact butterfly
            # values, half the memory-bound passes over the array (the NTT
            # is bandwidth-bound; each pass streams the whole batch)
            tw1 = stage_tw(s)                     # (h,)
            tw2 = stage_tw(s + 1)                 # (2h,)
            w2a, w2b = tw2[:half], tw2[half:]
            y = x.reshape(pre + (n // (4 * half), 4, half))
            x0, x1 = y[..., 0, :], y[..., 1, :]
            x2, x3 = y[..., 2, :], y[..., 3, :]
            t1 = field.mul(x1, tw1)
            t3 = field.mul(x3, tw1)
            u0 = field.add(x0, t1)
            u1 = field.sub(x0, t1)
            u2 = field.add(x2, t3)
            u3 = field.sub(x2, t3)
            a2 = field.mul(u2, w2a)
            b2 = field.mul(u3, w2b)
            x = xp.concatenate(
                [field.add(u0, a2)[..., None, :],
                 field.add(u1, b2)[..., None, :],
                 field.sub(u0, a2)[..., None, :],
                 field.sub(u1, b2)[..., None, :]], axis=-2)
            s += 2
        else:
            tw = stage_tw(s)
            y = x.reshape(pre + (n // (2 * half), 2, half))
            a = y[..., 0, :]
            b = field.mul(y[..., 1, :], tw)
            x = xp.concatenate([field.add(a, b)[..., None, :],
                                field.sub(a, b)[..., None, :]], axis=-2)
            s += 1
        x = x.reshape(pre + (n,))
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
    if xp is np:
        powers = field.powers_host(shift, n)
    else:
        powers = _powers_on_device(xp, shift, n)
    scaled = field.mul(coeffs, powers)
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
    if xp is np:
        powers = field.powers_host(inv_shift, n)
    else:
        powers = _powers_on_device(xp, inv_shift, n)
    return field.mul(coeffs, powers)


def evaluate_poly(coeffs, x: int) -> int:
    """Horner evaluation of a host coefficient vector at a host scalar."""
    acc = 0
    for c in reversed([int(v) for v in np.asarray(coeffs)]):
        acc = (acc * x + c) % field.P
    return acc
