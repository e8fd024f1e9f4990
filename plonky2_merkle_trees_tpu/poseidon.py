"""Poseidon hash over Goldilocks — batched, TPU-first.

Implements the exact permutation plonky2 0.1.3's ``PoseidonHash`` uses
(width 12, rate 8, capacity 4, 4 full + 22 partial + 4 full rounds, x^7
S-box, circulant-plus-diagonal MDS) and the sponge modes the reference
consumes:

* ``hash_or_noop``   — inputs of <= 4 field elements are returned zero-padded
  and UNHASHED (reference simple_merkle_tree.rs:33,93: level-0 "hashes" are
  ``[leaf, 0, 0, 0]``; a 1-peak MMR's bagged root equals the peak,
  naive_merkle_mountain_ranges.rs:369-371).
* ``two_to_one``     — 8-element -> 4-element compression
  (simple_merkle_tree.rs:23,45; merkle_mountain_ranges.rs:111).
* ``hash_n_to_m_no_pad`` — the general overwrite-mode sponge
  (bagging peaks, merkle_mountain_ranges.rs:125).

Everything is written over the generic uint64 array ops in ``field.py`` so
the same code path runs vectorised under numpy (host) and jax.numpy (TPU).
A fused Pallas kernel for the permutation lives in ops/poseidon_pallas.py.
"""

import numpy as np

from . import field
from .poseidon_constants import (
    WIDTH, RATE, N_ROUNDS, HALF_FULL_ROUNDS, PARTIAL_ROUNDS,
    MDS_MATRIX_CIRC, MDS_MATRIX_DIAG, all_round_constants,
)

_RC = all_round_constants()  # 360 python ints
_RC_TABLE = np.array(_RC, dtype=np.uint64).reshape(N_ROUNDS, WIDTH)
_CIRC = np.array(MDS_MATRIX_CIRC, dtype=np.uint64)
_DIAG = np.array(MDS_MATRIX_DIAG, dtype=np.uint64)


def _mds_layer(state, xp):
    """MDS multiply exploiting the circulant structure and tiny entries:
    ``out[r] = sum_k CIRC[k] * state[(r+k) % 12] + DIAG[r] * state[r]``
    becomes 12 rolls with small-constant multiplies, accumulated exactly in
    u64 hi/lo halves and reduced once — no full 64-bit field products."""
    m32 = xp.uint64(field.MASK32)
    s_lo = state & m32          # (..., 12)
    s_hi = state >> 32          # (..., 12)
    diag = xp.asarray(_DIAG)
    # acc_* <= (sum CIRC + 8) * (2^32-1) = 264 * (2^32-1) < 2^41 — safe in u64.
    acc_lo = diag * s_lo
    acc_hi = diag * s_hi
    for k in range(WIDTH):
        c = xp.uint64(int(_CIRC[k]))
        rolled_lo = xp.roll(s_lo, -k, axis=-1)
        rolled_hi = xp.roll(s_hi, -k, axis=-1)
        acc_lo = acc_lo + c * rolled_lo
        acc_hi = acc_hi + c * rolled_hi
    # value = acc_hi * 2^32 + acc_lo  (a ~73-bit quantity)
    top = acc_hi >> 32
    lo = ((acc_hi & m32) << 32) + acc_lo
    top = top + (lo < acc_lo).astype(xp.uint64)
    return field.reduce128(top, lo)


def _mds_layer_cols(state, xp):
    """``_mds_layer`` twin for (12, m) stacks — lanes on axis 0, points on
    the minor axis so the big dimension stays on the TPU vector lanes and
    no (12, m) <-> (m, 12) relayout is needed.  Same exact accumulate-then-
    reduce math; bit-identical outputs."""
    m32 = xp.uint64(field.MASK32)
    s_lo = state & m32          # (12, m)
    s_hi = state >> 32
    diag = xp.asarray(_DIAG)[:, None]
    acc_lo = diag * s_lo
    acc_hi = diag * s_hi
    for k in range(WIDTH):
        c = xp.uint64(int(_CIRC[k]))
        acc_lo = acc_lo + c * xp.roll(s_lo, -k, axis=0)
        acc_hi = acc_hi + c * xp.roll(s_hi, -k, axis=0)
    top = acc_hi >> 32
    lo = ((acc_hi & m32) << 32) + acc_lo
    top = top + (lo < acc_lo).astype(xp.uint64)
    return field.reduce128(top, lo)


def _full_round(state, rc_row, xp):
    state = field.add(state, rc_row)
    state = field.exp7(state)
    return _mds_layer(state, xp)


def _partial_round(state, rc_row, xp):
    state = field.add(state, rc_row)
    lane0 = field.exp7(state[..., 0])
    if xp is np:
        state = state.copy()
        state[..., 0] = lane0
    else:
        state = state.at[..., 0].set(lane0)
    return _mds_layer(state, xp)


def _permute_np(state):
    with np.errstate(over="ignore"):
        for r in range(HALF_FULL_ROUNDS):
            state = _full_round(state, _RC_TABLE[r], np)
        for r in range(HALF_FULL_ROUNDS, HALF_FULL_ROUNDS + PARTIAL_ROUNDS):
            state = _partial_round(state, _RC_TABLE[r], np)
        for r in range(HALF_FULL_ROUNDS + PARTIAL_ROUNDS, N_ROUNDS):
            state = _full_round(state, _RC_TABLE[r], np)
    return state


def _permute_jnp(state):
    # lax.fori_loop keeps the traced graph ~30x smaller than unrolling the
    # rounds — compile time matters when the permutation is instantiated per
    # tree level inside larger XLA programs.
    import jax
    import jax.numpy as jnp
    rc = jnp.asarray(_RC_TABLE)
    f = HALF_FULL_ROUNDS
    p = PARTIAL_ROUNDS
    state = jax.lax.fori_loop(0, f, lambda i, s: _full_round(s, rc[i], jnp), state)
    state = jax.lax.fori_loop(f, f + p, lambda i, s: _partial_round(s, rc[i], jnp), state)
    state = jax.lax.fori_loop(f + p, N_ROUNDS, lambda i, s: _full_round(s, rc[i], jnp), state)
    return state


def permute(state):
    """Poseidon permutation on a (..., 12) uint64 array (numpy or jnp)."""
    if field._xp(state) is np:
        return _permute_np(state)
    return _permute_jnp(state)


_JIT_PERMUTE = None
PERMUTE_JIT_THRESHOLD = 4096


def permute_best(state):
    """Batched permutation with the best backend for where the data lives.

    * jax arrays stay on device (XLA path; use the Pallas kernel directly for
      the largest batches).
    * numpy arrays route through the native C++ library when available (~7x
      the vectorised-numpy path on this host) — crucially WITHOUT a
      host->device round trip: the tunnel transfer + per-process warmup cost
      far exceeds the compute for any host-side batch worth keeping on host.
    * without the native lib, large host batches fall back to jitted XLA,
      but ONLY on a CPU backend — shipping them through an accelerator
      tunnel costs far more than it saves (measured: one 65k batch, 260s).
    """
    if field._xp(state) is not np:
        return _permute_jnp(state)
    nat = _native()
    if nat and state.ndim == 2:
        return nat.permute_batch(state)
    if state.ndim == 2 and state.shape[0] >= PERMUTE_JIT_THRESHOLD:
        import jax
        if jax.default_backend() == "cpu":
            global _JIT_PERMUTE
            if _JIT_PERMUTE is None:
                _JIT_PERMUTE = jax.jit(_permute_jnp)
            return np.asarray(_JIT_PERMUTE(state))
    return _permute_np(state)


# ---------------------------------------------------------------------------
# Batched sponge modes (arrays of digests; leading batch dims arbitrary)
# ---------------------------------------------------------------------------

def two_to_one(left, right):
    """Compress two (..., 4) digest arrays into one (..., 4) digest array."""
    xp = field._xp(left)
    cap = xp.zeros(left.shape[:-1] + (4,), dtype=xp.uint64)
    state = xp.concatenate([left, right, cap], axis=-1)
    if xp is np and state.ndim == 2:
        return permute_best(state)[..., :4]   # native C++ fast path on host
    return permute(state)[..., :4]


def hash_leaves(leaves):
    """``hash_or_noop([leaf])`` for a (...,) array of single field elements:
    the noop rule applies, digests are ``[leaf, 0, 0, 0]``."""
    xp = field._xp(leaves)
    zeros = xp.zeros(leaves.shape + (3,), dtype=xp.uint64)
    return xp.concatenate([leaves[..., None], zeros], axis=-1)


def hash_n_to_m_no_pad(inputs, num_outputs=4):
    """Overwrite-mode sponge over a flat (n,) uint64 array -> (num_outputs,).

    Matches plonky2's ``hash_n_to_m_no_pad``: absorb in rate-8 chunks by
    overwriting the leading state lanes, permuting after every (possibly
    partial) chunk; squeeze from the leading lanes.
    """
    xp = field._xp(inputs)
    n = int(inputs.shape[0])
    state = xp.zeros((WIDTH,), dtype=xp.uint64)
    for start in range(0, n, RATE):
        chunk = inputs[start:start + RATE]
        k = int(chunk.shape[0])
        if xp is np:
            state = state.copy()
            state[:k] = chunk
        else:
            state = state.at[:k].set(chunk)
        state = permute(state)
    outputs = []
    while True:
        avail = state[:RATE]
        outputs.append(avail)
        total = sum(int(o.shape[0]) for o in outputs)
        if total >= num_outputs:
            return xp.concatenate(outputs, axis=0)[:num_outputs]
        state = permute(state)


def hash_no_pad(inputs):
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs):
    """plonky2 ``PoseidonHash::hash_or_noop`` on a flat (n,) uint64 array."""
    xp = field._xp(inputs)
    n = int(inputs.shape[0])
    if n <= 4:
        out = xp.zeros((4,), dtype=xp.uint64)
        if xp is np:
            out = out.copy()
            out[:n] = inputs
            return out
        return out.at[:n].set(inputs)
    return hash_no_pad(inputs)


# ---------------------------------------------------------------------------
# Host scalar path (python ints) — for sequential flows (MMR appends, tests)
# ---------------------------------------------------------------------------

_P = field.P
_MDS_ROWS = [
    tuple(MDS_MATRIX_CIRC[(c - r) % WIDTH] + (MDS_MATRIX_DIAG[r] if c == r else 0)
          for c in range(WIDTH))
    for r in range(WIDTH)
]


def _h_sbox(x):
    x2 = x * x % _P
    x3 = x2 * x % _P
    return x3 * x3 % _P * x % _P


def permute_host(state):
    """Scalar Poseidon permutation on a list of 12 python ints."""
    s = list(state)
    rnd = 0
    for phase, count in ((0, HALF_FULL_ROUNDS), (1, PARTIAL_ROUNDS), (0, HALF_FULL_ROUNDS)):
        for _ in range(count):
            base = 12 * rnd
            s = [(x + _RC[base + i]) % _P for i, x in enumerate(s)]
            if phase == 0:
                s = [_h_sbox(x) for x in s]
            else:
                s[0] = _h_sbox(s[0])
            s = [sum(m * x for m, x in zip(row, s)) % _P for row in _MDS_ROWS]
            rnd += 1
    return s


def _digest(values) -> np.ndarray:
    return np.array(values[:4], dtype=np.uint64)


_NATIVE = None


def _native():
    """Lazy handle to the C++ host library (False when unavailable)."""
    global _NATIVE
    if _NATIVE is None:
        from . import native
        _NATIVE = native if native.available() else False
    return _NATIVE


def permute_scalar(state):
    """Scalar permutation on a list of 12 ints (C++ fast path)."""
    nat = _native()
    if nat:
        arr = np.asarray([int(v) % _P for v in state], dtype=np.uint64)
        return [int(v) for v in nat.permute_batch(arr[None, :])[0]]
    return permute_host(state)


def two_to_one_scalar(left, right) -> np.ndarray:
    """Host-scalar two_to_one on (4,)-digests (C++ fast path, python fallback)."""
    nat = _native()
    if nat:
        return nat.two_to_one(left, right)[0]
    state = [int(x) for x in left] + [int(x) for x in right] + [0, 0, 0, 0]
    return _digest(permute_host(state))


def hash_no_pad_scalar(inputs) -> np.ndarray:
    """Host-scalar overwrite-mode sponge over a list of ints -> (4,) digest."""
    nat = _native()
    if nat:
        return nat.hash_no_pad(np.asarray([int(v) % _P for v in inputs],
                                          dtype=np.uint64))
    vals = [int(x) for x in inputs]
    state = [0] * WIDTH
    for start in range(0, len(vals), RATE):
        chunk = vals[start:start + RATE]
        state[:len(chunk)] = chunk
        state = permute_host(state)
    return _digest(state)


def hash_or_noop_scalar(inputs) -> np.ndarray:
    vals = [int(x) for x in inputs]
    if len(vals) <= 4:
        return _digest(vals + [0] * (4 - len(vals)))
    return hash_no_pad_scalar(vals)
