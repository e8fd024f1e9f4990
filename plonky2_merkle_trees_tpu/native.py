"""ctypes bindings for the native host library (native/goldilocks_poseidon.cpp).

The library is compiled on first use with g++ -O3 and cached next to the
source; if no compiler is available everything falls back to the pure-Python
scalar paths transparently (``available()`` reports which is active).
Parameters are injected from poseidon_constants.py at load, keeping a single
source of truth for the round constants.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

from .poseidon_constants import all_round_constants, mds_matrix

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "goldilocks_poseidon.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libgoldilocks_poseidon.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.gp_init.argtypes = [u64p, u64p]
        lib.gp_ready.restype = ctypes.c_int
        lib.gp_permute_batch.argtypes = [u64p, ctypes.c_size_t]
        lib.gp_two_to_one_batch.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.gp_hash_no_pad.argtypes = [u64p, ctypes.c_size_t, u64p]
        lib.gp_tree_level.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.gp_mmr_from_leaves.argtypes = [u64p, ctypes.c_size_t, u64p]
        lib.gp_poseidon_gate_trace.argtypes = [u64p, u64p]
        lib.gp_poseidon_gate_trace_batch.argtypes = [u64p, u64p, ctypes.c_size_t]
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gp_run_witness.argtypes = [
            i32p, i64p, i64p, ctypes.c_int64,          # ops, args, arg_off, n
            i64p, i32p, ctypes.c_int64,                # cons_off, cons_idx, n_roots
            u64p, u8p, u8p, i32p, i32p, i64p]          # V, K, avail, unmet, queue, err
        lib.gp_run_witness.restype = ctypes.c_int
        lib.gp_ext_tape.argtypes = [i32p, ctypes.c_int64, u64p]
        lib.gp_hash_rows.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t, u64p]
        lib.gp_verify_paths.argtypes = [u64p, u64p, i64p,
                                        ctypes.c_size_t, ctypes.c_size_t]
        lib.gp_sponge_absorb.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.gp_ext_dot.argtypes = [u64p, u64p, u64p,
                                   ctypes.c_size_t, ctypes.c_size_t, u64p]
        lib.gp_fold_coset.argtypes = [u64p, u64p, ctypes.c_uint64, u64p,
                                      ctypes.c_uint64, ctypes.c_size_t,
                                      ctypes.c_size_t, u64p]
        lib.gp_ext_horner.argtypes = [u64p, ctypes.c_size_t, u64p,
                                      ctypes.c_size_t, u64p]
        rc = np.array(all_round_constants(), dtype=np.uint64)
        mds = np.array(mds_matrix(), dtype=np.uint64).reshape(-1)
        lib.gp_init(rc.ctypes.data_as(u64p), mds.ctypes.data_as(u64p))
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def permute_batch(states: np.ndarray) -> np.ndarray:
    """In-place-style batch permutation; returns a new (n, 12) array."""
    lib = _load()
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.gp_permute_batch(_ptr(out), out.shape[0])
    return out


def two_to_one(left, right) -> np.ndarray:
    lib = _load()
    left = np.ascontiguousarray(left, dtype=np.uint64).reshape(-1, 4)
    right = np.ascontiguousarray(right, dtype=np.uint64).reshape(-1, 4)
    out = np.empty_like(left)
    lib.gp_two_to_one_batch(_ptr(left), _ptr(right), _ptr(out), left.shape[0])
    return out


def hash_no_pad(inputs) -> np.ndarray:
    lib = _load()
    arr = np.ascontiguousarray(inputs, dtype=np.uint64)
    out = np.empty(4, dtype=np.uint64)
    lib.gp_hash_no_pad(_ptr(arr), arr.shape[0], _ptr(out))
    return out


def tree_level(level: np.ndarray) -> np.ndarray:
    lib = _load()
    level = np.ascontiguousarray(level, dtype=np.uint64)
    n_pairs = level.shape[0] // 2
    out = np.empty((n_pairs, 4), dtype=np.uint64)
    lib.gp_tree_level(_ptr(level), _ptr(out), n_pairs)
    return out


def poseidon_gate_trace(inputs) -> np.ndarray:
    """All 118 stored wire values of one PoseidonGate row (see gates.py):
    [S1, S2, S3 (36), PR (22), S26..S29 (48), OUT (12)]."""
    lib = _load()
    arr = np.ascontiguousarray(inputs, dtype=np.uint64)
    out = np.empty(118, dtype=np.uint64)
    lib.gp_poseidon_gate_trace(_ptr(arr), _ptr(out))
    return out


def poseidon_gate_trace_batch(inputs: np.ndarray) -> np.ndarray:
    """(n, 12) gate inputs -> (n, 118) stored wires (see poseidon_gate_trace)."""
    lib = _load()
    arr = np.ascontiguousarray(inputs, dtype=np.uint64)
    out = np.empty((arr.shape[0], 118), dtype=np.uint64)
    lib.gp_poseidon_gate_trace_batch(_ptr(arr), _ptr(out), arr.shape[0])
    return out


def run_witness(prog, V: np.ndarray, K: np.ndarray):
    """Execute a witness-generation program (see gp_run_witness in the C++
    source: dependency-scheduled instruction stream) over the dense store.
    ``prog`` is the dict built by circuit_data._build_witness_program.
    Returns (code, err_idx): code 0 ok, 1 conflict, 2 stuck, 3 zero-inv."""
    lib = _load()
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ops, args, arg_off = prog["ops"], prog["args"], prog["arg_off"]
    cons_off, cons_idx = prog["cons_off"], prog["cons_idx"]
    n_instr = int(ops.shape[0])
    avail = K.view(np.uint8).copy()
    unmet = np.empty(n_instr, dtype=np.int32)
    queue = np.empty(n_instr, dtype=np.int32)
    err = ctypes.c_int64(-1)
    code = lib.gp_run_witness(
        ops.ctypes.data_as(i32p), args.ctypes.data_as(i64p),
        arg_off.ctypes.data_as(i64p), n_instr,
        cons_off.ctypes.data_as(i64p), cons_idx.ctypes.data_as(i32p),
        int(cons_off.shape[0]) - 1,
        _ptr(V), K.ctypes.data_as(u8p), avail.ctypes.data_as(u8p),
        unmet.ctypes.data_as(i32p), queue.ctypes.data_as(i32p),
        ctypes.byref(err))
    return code, err.value


def mmr_from_leaves(leaves) -> np.ndarray:
    lib = _load()
    leaves = np.ascontiguousarray(leaves, dtype=np.uint64)
    n = int(leaves.shape[0])
    size = 2 * n - bin(n).count("1")
    out = np.empty((size, 4), dtype=np.uint64)
    lib.gp_mmr_from_leaves(_ptr(leaves), n, _ptr(out))
    return out


def ext_tape(instrs: np.ndarray, regs: np.ndarray) -> None:
    """Execute a straight-line GF(p^2) op tape IN PLACE on the (n_regs, 2)
    register file (see gp_ext_tape; recorded by plonk.algebra's
    RecordingAlgebra).  Caller pre-fills constant and input registers."""
    lib = _load()
    assert instrs.dtype == np.int32 and instrs.flags.c_contiguous
    assert regs.dtype == np.uint64 and regs.flags.c_contiguous
    lib.gp_ext_tape(instrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    instrs.shape[0], _ptr(regs))


def hash_rows(matrix: np.ndarray) -> np.ndarray:
    """hash_or_noop over each row of an (n, m) matrix -> (n, 4) digests,
    whole sponge in one native call (vectorised permutes)."""
    lib = _load()
    arr = np.ascontiguousarray(matrix, dtype=np.uint64)
    n, m = arr.shape
    out = np.empty((n, 4), dtype=np.uint64)
    lib.gp_hash_rows(_ptr(arr), n, m, _ptr(out))
    return out


def verify_paths(current: np.ndarray, sibs: np.ndarray,
                 indices: np.ndarray):
    """Batched Merkle-path replay: (n,4) leaf digests x (n,L,4) sibling
    paths -> (final (n,4) digests, cap indices).  One native call for the
    whole walk."""
    lib = _load()
    cur = np.ascontiguousarray(current, dtype=np.uint64).copy()
    sib = np.ascontiguousarray(sibs, dtype=np.uint64)
    idx = np.ascontiguousarray(indices, dtype=np.int64).copy()
    n = cur.shape[0]
    n_levels = sib.shape[1] if sib.size else 0
    if n_levels:
        lib.gp_verify_paths(_ptr(cur), _ptr(sib),
                            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                            n, n_levels)
    return cur, idx


def sponge_absorb(state: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Duplex-sponge bulk absorb: overwrite-mode chunks of RATE.  ``xs``
    length must be a multiple of 8 (caller drains partial buffers)."""
    lib = _load()
    st = np.ascontiguousarray(state, dtype=np.uint64).copy()
    arr = np.ascontiguousarray(xs, dtype=np.uint64)
    assert arr.shape[0] % 8 == 0
    lib.gp_sponge_absorb(_ptr(st), _ptr(arr), arr.shape[0])
    return st


def ext_dot(vals: np.ndarray, ys: np.ndarray, apow: np.ndarray) -> np.ndarray:
    """out[q] = sum_j apow[j] * (vals[q, j] - ys[j]) over GF(p^2)."""
    lib = _load()
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    ys = np.ascontiguousarray(ys, dtype=np.uint64)
    apow = np.ascontiguousarray(apow, dtype=np.uint64)
    q, n = vals.shape
    out = np.empty((q, 2), dtype=np.uint64)
    lib.gp_ext_dot(_ptr(vals), _ptr(ys), _ptr(apow), q, n, _ptr(out))
    return out


def fold_coset(vals: np.ndarray, x0: np.ndarray, wm: int, beta,
               half_inv: int) -> np.ndarray:
    """Fold each opened (2^a, 2) FRI coset down to one extension value
    (exact twin of the vectorised numpy walk; see gp_fold_coset)."""
    lib = _load()
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    x0 = np.ascontiguousarray(x0, dtype=np.uint64)
    beta_arr = np.ascontiguousarray(beta, dtype=np.uint64)
    q, size, _ = vals.shape
    a_bits = size.bit_length() - 1
    out = np.empty((q, 2), dtype=np.uint64)
    lib.gp_fold_coset(_ptr(vals), _ptr(x0), ctypes.c_uint64(wm),
                      _ptr(beta_arr), ctypes.c_uint64(half_inv),
                      q, a_bits, _ptr(out))
    return out


def ext_horner(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Batched Horner evaluation of an extension polynomial at base points."""
    lib = _load()
    coeffs = np.ascontiguousarray(coeffs, dtype=np.uint64)
    x = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.empty((x.shape[0], 2), dtype=np.uint64)
    lib.gp_ext_horner(_ptr(coeffs), coeffs.shape[0], _ptr(x), x.shape[0],
                      _ptr(out))
    return out
