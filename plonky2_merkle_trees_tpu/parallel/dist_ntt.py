"""Mesh-decomposed NTT — the four-step (transpose) algorithm, prover-grade.

A size-m transform with m = n1 * n2 decomposes (index split j = n2*j1 + j2,
k = k1 + n1*k2) into

  1. a batch of n2 LOCAL size-n1 NTTs        S[k1, j2] = NTT_j1 A[j1, j2]
  2. a twiddle multiply                       C[k1, j2] = S * w^(j2*k1)
  3. a transpose (the ONLY cross-device data motion)
  4. a batch of n1 LOCAL size-n2 NTTs        U[k1, k2] = NTT_j2 C[k1, j2]

with A = x.reshape(n1, n2) and the natural-order result U.T.flatten().
Expressed GSPMD-style: the local transforms are ordinary ``plonk.ntt`` calls
on unsharded axes, the transpose is a ``with_sharding_constraint`` boundary,
and XLA inserts the all-to-all — exactly the "butterfly stages exchanged
over ICI" design of SURVEY.md §2.3's sequence-parallel row (the reference
has no distributed code at all).

Prover-grade properties (VERDICT r1 #2):
  * batched: any leading dims, so the 135-poly LDE shapes work;
  * all tables (twiddles, inverse-shift powers) are built ON DEVICE from
    host scalar constants by log-doubling — no O(N) traced literals;
  * the sharded entry points return DOMAIN-SHARDED outputs (no replicated
    gather); ``np.asarray`` gathers when a host copy is wanted;
  * ``four_step_ntt`` is traceable inside a larger jitted program — the
    device prover's quotient stage uses it for its single-vector size-m
    transforms (plonk/device.py:_stage_mono_quotient).

Bit-exactness: modular arithmetic is exact, so the four-step result is
bit-identical to ``plonk.ntt.ntt`` for every input (tested on the CPU mesh).
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import field
from ..plonk import ntt as nttmod
from .mesh import SHARD_AXIS, _mk_constrainer, default_mesh


def _twiddle_matrix(xp, w_int: int, n2: int, n1: int):
    """T[j2, k1] = w^(j2*k1) built on device by column log-doubling:
    T[:, k+i] = T[:, i] * (w^k)^(j2), and (w^k)^(j2) is a powers table of
    the HOST constant w^k — ~log2(n1) vectorised multiplies total."""
    cols = xp.ones((n2, 1), dtype=xp.uint64)
    k = 1
    while k < n1:
        step = min(k, n1 - k)
        colfac = nttmod._powers_on_device(xp, pow(w_int, k, field.P), n2)
        cols = xp.concatenate(
            [cols, field.mul(cols[:, :step], colfac[:, None])], axis=1)
        k += step
    return cols


def four_step_ntt(values, inverse: bool = False, cst=None,
                  split_bits: int = None):
    """Traced four-step transform of a (..., m) uint64 array.

    ``cst`` is a mesh constrainer (parallel.mesh._mk_constrainer's first
    element) — when given, the two local transform phases are pinned to
    opposite shardings of the matrix view, making the middle transpose the
    one all-to-all.  With cst=None this is simply a (slower, two-level)
    single-device NTT — it exists for testing the decomposition itself.
    """
    xp = field._xp(values)
    m = int(values.shape[-1])
    log_m = m.bit_length() - 1
    if (1 << log_m) != m:
        raise ValueError(f"NTT size {m} is not a power of two")
    if log_m < 2:
        return nttmod.ntt(values, inverse=inverse)
    n1_log = split_bits if split_bits is not None else log_m // 2
    n1, n2 = 1 << n1_log, m >> n1_log
    w = field.primitive_root_of_unity(log_m)
    if inverse:
        w = field.h_inverse(w)
    pre = values.shape[:-1]
    nd = len(pre)

    A = values.reshape(pre + (n1, n2))          # A[j1, j2] = x[n2*j1 + j2]
    At = A.swapaxes(-1, -2)                     # (..., n2, n1)
    if cst is not None:
        At = cst(At, nd)                        # shard j2 -> NTT_j1 local
    St = nttmod.ntt(At, inverse=inverse)        # S[j2, k1]
    tw = _twiddle_matrix(xp, w, n2, n1)
    if cst is not None:
        # pin the pre-transpose sharding on both operands so the later
        # boundary constraint cannot propagate BACKWARD into the local
        # butterflies (which would make XLA rematerialize them replicated)
        St = cst(St, nd)
        tw = cst(tw, 0)
    Ct = field.mul(St, tw)
    C = Ct.swapaxes(-1, -2)                     # (..., n1=k1, n2=j2)
    if cst is not None:
        C = cst(C, nd)                          # TRANSPOSE: the all-to-all
    U = nttmod.ntt(C, inverse=inverse)          # U[k1, k2]
    if cst is not None:
        U = cst(U, nd)
    X = U.swapaxes(-1, -2).reshape(pre + (m,))  # X[k1 + n1*k2] = U[k1, k2]
    if cst is not None:
        X = cst(X, nd)
    return X


def coset_intt_sharded(evals, cst,
                       shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR):
    """Traced mesh twin of plonk.ntt.coset_intt for (..., m) arrays: the
    four-step inverse transform plus the on-device inverse-shift scaling.
    Bit-identical values to the single-device path."""
    xp = field._xp(evals)
    m = int(evals.shape[-1])
    coeffs = four_step_ntt(evals, inverse=True, cst=cst)
    powers = nttmod._powers_on_device(xp, field.h_inverse(shift), m)
    return field.mul(coeffs, powers)


def coset_lde_sharded(coeffs, rate_bits: int, cst,
                      shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR):
    """Traced mesh twin of plonk.ntt.coset_lde for (..., n) arrays whose
    TRANSFORM axis (not a batch axis) must shard — zero-pad, scale by
    on-device shift powers, four-step forward transform."""
    xp = field._xp(coeffs)
    n = int(coeffs.shape[-1])
    big_n = n << rate_bits
    powers = nttmod._powers_on_device(xp, shift, n)
    scaled = field.mul(coeffs, powers)
    padded = xp.zeros(coeffs.shape[:-1] + (big_n,), dtype=xp.uint64)
    padded = padded.at[..., :n].set(scaled)
    return four_step_ntt(padded, cst=cst)


@lru_cache(maxsize=None)
def _dist_fn(mesh, inverse: bool):
    cst, _ = _mk_constrainer(mesh)
    return jax.jit(lambda x: four_step_ntt(x, inverse=inverse, cst=cst))


def dist_ntt(values, mesh=None, inverse: bool = False):
    """NTT of a (..., N) uint64 array with the transform axis sharded over
    the mesh.  Returns the natural-order result as a DOMAIN-SHARDED device
    array, bit-identical to ``plonk.ntt.ntt`` (``np.asarray`` gathers a
    host copy)."""
    mesh = mesh or default_mesh()
    n_dev = int(mesh.devices.size)
    if n_dev & (n_dev - 1):
        raise ValueError("dist_ntt needs a power-of-two device count")
    n = int(values.shape[-1])
    if n & (n - 1):
        raise ValueError(f"NTT size {n} is not a power of two")
    spec = [None] * (values.ndim - 1) + [SHARD_AXIS]
    x = jax.device_put(jnp.asarray(values),
                       NamedSharding(mesh, P(*spec)))
    return _dist_fn(mesh, inverse)(x)


def dist_intt(values, mesh=None):
    return dist_ntt(values, mesh, inverse=True)
