"""Polynomial batch commitments: coset LDE + Poseidon Merkle caps.

A batch of row polynomials (one per column of the trace) is committed as a
single Merkle tree whose leaf i is the vector of ALL polynomials' values at
LDE point i — one tree per oracle, exactly plonky2's PolynomialBatch shape.
Bulk hashing is the batched Poseidon sponge (one permutation launch per
absorb chunk per level), i.e. the same kernels that power the Merkle-tree
layer (SURVEY.md §2.2 "Poseidon Merkle-cap commitments").
"""

from dataclasses import dataclass
from typing import List

import numpy as np

from .. import field, poseidon
from ..poseidon_constants import RATE, WIDTH
from .field_ext import ExtensionField
from . import ntt as nttmod


def hash_rows(matrix) -> np.ndarray:
    """hash_or_noop over each row of an (n, m) uint64 matrix -> (n, 4)."""
    xp = field._xp(matrix)
    n, m = int(matrix.shape[0]), int(matrix.shape[1])
    if xp is np and m > 4:
        from .. import native
        if native.available():
            # whole sponge in ONE call (AVX-512 batched permutes) instead
            # of m/RATE ctypes round trips
            return native.hash_rows(np.asarray(matrix, dtype=np.uint64))
    if m <= 4:
        out = xp.zeros((n, 4), dtype=xp.uint64)
        if xp is np:
            out[:, :m] = matrix
            return out
        return out.at[:, :m].set(matrix)
    state = xp.zeros((n, WIDTH), dtype=xp.uint64)
    for start in range(0, m, RATE):
        chunk = matrix[:, start:start + RATE]
        k = int(chunk.shape[1])
        if xp is np:
            state = state.copy()
            state[:, :k] = chunk
        else:
            state = state.at[:, :k].set(chunk)
        state = poseidon.permute_best(state)
    return state[:, :4]


class MerkleCommitment:
    """Merkle tree with a cap over vector leaves; supports query openings."""

    def __init__(self, leaves: np.ndarray, cap_height: int):
        leaves = np.asarray(leaves, dtype=np.uint64)
        n = leaves.shape[0]
        log_n = n.bit_length() - 1
        assert (1 << log_n) == n, "leaf count must be a power of two"
        cap_height = min(cap_height, log_n)
        self.cap_height = cap_height
        self.leaves = leaves
        level = hash_rows(leaves)
        self.levels = [level]   # digests, leaf level first
        while level.shape[0] > (1 << cap_height):
            pairs = level.reshape(-1, 2, 4)
            level = poseidon.two_to_one(pairs[:, 0, :], pairs[:, 1, :])
            self.levels.append(level)

    @classmethod
    def from_levels(cls, levels, cap_height: int) -> "MerkleCommitment":
        """Wrap precomputed digest levels (e.g. built inside a jitted device
        stage) without re-hashing or forcing a device->host copy."""
        obj = cls.__new__(cls)
        obj.cap_height = cap_height
        obj.leaves = None
        obj.levels = list(levels)
        return obj

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    def open(self, index: int) -> List[np.ndarray]:
        """Sibling digests from the leaf up to (excluding) the cap."""
        return self.open_many([index])[0]

    def open_many(self, indices) -> List[List[np.ndarray]]:
        """Batched openings.  Device-resident trees pay ONE gather per level
        on device and ONE host transfer total (the per-level gathers are
        concatenated before the fetch).  Returns one sibling path (list of
        (4,) digests) per index."""
        idxs = np.asarray([int(i) for i in indices], dtype=np.int64)
        n_q = len(indices)
        inner = self.levels[:-1]
        if not inner:
            return [[] for _ in range(n_q)]
        xp = field._xp(inner[0])
        gathered = []
        for level in inner:
            sel = idxs ^ 1
            gathered.append(level[sel] if xp is np else level[xp.asarray(sel)])
            idxs = idxs // 2
        if xp is np:
            per_level = gathered
        else:
            flat = np.asarray(xp.concatenate(gathered, axis=0))   # one transfer
            per_level = [flat[i * n_q:(i + 1) * n_q] for i in range(len(inner))]
        return [[lv[q] for lv in per_level] for q in range(n_q)]

    @staticmethod
    def verify(leaf_values, index: int, path: List[np.ndarray], cap) -> bool:
        """Check a leaf opening against the cap."""
        current = poseidon.hash_or_noop_scalar([int(v) for v in leaf_values]) \
            if len(leaf_values) <= 4 else \
            poseidon.hash_no_pad_scalar([int(v) for v in leaf_values])
        idx = index
        for sibling in path:
            if idx % 2 == 0:
                current = poseidon.two_to_one_scalar(current, sibling)
            else:
                current = poseidon.two_to_one_scalar(sibling, current)
            idx //= 2
        return bool(np.array_equal(current, np.asarray(cap)[idx]))

    @staticmethod
    def verify_batch(leaves_matrix: np.ndarray, indices: np.ndarray,
                     paths, cap) -> bool:
        """``verify`` for MANY openings of the SAME tree at once: one
        batched sponge for the leaf hashes and one batched two_to_one per
        path level (native C++ fast path via poseidon.permute_best) —
        ~5-10x the per-query scalar walk on this 1-core host, identical
        accept/reject semantics.  Raises ValueError on ragged/malformed
        paths (the verifier maps exceptions to rejection)."""
        q = int(leaves_matrix.shape[0])
        if {len(p) for p in paths} != {len(paths[0])}:
            raise ValueError("ragged path lengths")
        current = hash_rows(np.asarray(leaves_matrix, dtype=np.uint64))
        if len(paths[0]):
            sib = np.asarray(paths, dtype=np.uint64)
            if sib.shape != (q, len(paths[0]), 4):
                raise ValueError("malformed sibling digests")
        else:
            sib = np.zeros((q, 0, 4), dtype=np.uint64)
        idx = np.asarray(indices, dtype=np.int64).copy()
        from .. import native
        if native.available():
            # full path walk in one native call (one vectorised two_to_one
            # per level, no per-level ctypes/numpy overhead)
            current, idx = native.verify_paths(current, sib, idx)
        else:
            for level in range(sib.shape[1]):
                s = sib[:, level]
                even = (idx % 2 == 0)[:, None]
                left = np.where(even, current, s)
                right = np.where(even, s, current)
                current = poseidon.two_to_one(left, right)
                idx //= 2
        cap_arr = np.asarray(cap, dtype=np.uint64)
        if (idx >= cap_arr.shape[0]).any():
            raise IndexError("path/cap length mismatch")
        return bool(np.array_equal(current, cap_arr[idx]))


@dataclass
class PolynomialBatch:
    """Committed oracle: row values, coefficients, LDE values, Merkle tree."""

    values: np.ndarray       # (num_polys, N) — evaluations over the subgroup
    coeffs: np.ndarray       # (num_polys, N)
    lde_values: np.ndarray   # (num_polys, N << rate_bits), coset g*H
    tree: MerkleCommitment
    rate_bits: int
    salt: np.ndarray = None  # (M, 4) zero-knowledge leaf salt, or None

    @staticmethod
    def from_values(values, rate_bits: int, cap_height: int,
                    salt_rng=None) -> "PolynomialBatch":
        values = np.asarray(values, dtype=np.uint64)
        coeffs = nttmod.intt(values)
        return PolynomialBatch.from_coeffs(coeffs, rate_bits, cap_height,
                                           values=values, salt_rng=salt_rng)

    @staticmethod
    def from_coeffs(coeffs, rate_bits: int, cap_height: int,
                    values=None, salt_rng=None) -> "PolynomialBatch":
        """``salt_rng``: when given (zero_knowledge proving), 4 fresh random
        field elements are appended to every Merkle LEAF — openings reveal
        leaf rows, so the salt makes each revealed row statistically hiding
        (plonky2 0.1.3's salted-oracle technique; SALT_SIZE = 4).  The
        polynomials themselves are unchanged."""
        coeffs = np.asarray(coeffs, dtype=np.uint64)
        lde = np.asarray(nttmod.coset_lde(coeffs, rate_bits), dtype=np.uint64)
        leaf_mat = np.ascontiguousarray(lde.T)
        salt = None
        if salt_rng is not None:
            salt = salt_rng.integers(0, field.P, size=(leaf_mat.shape[0], 4),
                                     dtype=np.uint64)
            leaf_mat = np.concatenate([leaf_mat, salt], axis=1)
        tree = MerkleCommitment(leaf_mat, cap_height)
        return PolynomialBatch(values=values, coeffs=coeffs, lde_values=lde,
                               tree=tree, rate_bits=rate_bits, salt=salt)

    @property
    def cap(self) -> np.ndarray:
        return self.tree.cap

    def open_lde_row(self, index: int):
        """(leaf values at LDE index, merkle path)."""
        rows, paths = self.open_lde_rows([index])
        return rows[0], paths[0]

    def open_lde_rows(self, indices):
        """Batched query openings: ([leaf values per index], [path per index]);
        one gather+transfer per level for device-resident oracles.  Leaf
        values include the zero-knowledge salt columns when present."""
        idxs = np.asarray([int(i) for i in indices], dtype=np.int64)
        leaves = self.tree.leaves
        if leaves is not None and field._xp(leaves) is np:
            rows = leaves[idxs].copy()                        # incl. salt
        else:
            xp = field._xp(self.lde_values)
            sel = idxs if xp is np else xp.asarray(idxs)
            rows = np.asarray(self.lde_values[:, sel]).T.copy()  # (n_q, num_polys)
        return list(rows), self.tree.open_many(indices)

    def eval_at_ext(self, zeta: ExtensionField) -> List[ExtensionField]:
        """Evaluate every polynomial at an extension point (batched)."""
        return eval_coeffs_at_ext(self.coeffs, zeta)


def eval_coeffs_at_ext(coeffs: np.ndarray, zeta: ExtensionField) -> List[ExtensionField]:
    """Batched evaluation of (num_polys, N) base coefficients at an ext point.

    Uses a host-computed powers-of-zeta table (log-doubling, vectorised) and
    log-depth field-summed dot products (sum of products must stay reduced,
    so fold pairwise)."""
    from .field_ext import ext_mul
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    num_polys, n = coeffs.shape
    powers = np.zeros((n, 2), dtype=np.uint64)
    powers[0, 0] = 1
    cur = np.array([zeta.a0, zeta.a1], dtype=np.uint64)
    k = 1
    with np.errstate(over="ignore"):
        while k < n:
            step = min(k, n - k)
            powers[k:k + step] = ext_mul(
                powers[:step], np.broadcast_to(cur, (step, 2)))
            cur = ext_mul(cur[None, :], cur[None, :])[0]
            k += step
    pow0, pow1 = powers[:, 0], powers[:, 1]
    res = []
    for pw in (pow0, pow1):
        prods = field.mul(coeffs, pw[None, :])
        while prods.shape[1] > 1:
            half = prods.shape[1] // 2
            prods = field.add(prods[:, :half], prods[:, half:2 * half]) \
                if prods.shape[1] % 2 == 0 else \
                np.concatenate([field.add(prods[:, :half], prods[:, half:2 * half]),
                                prods[:, 2 * half:]], axis=1)
        res.append(prods[:, 0])
    return [ExtensionField(int(a), int(b)) for a, b in zip(res[0], res[1])]
