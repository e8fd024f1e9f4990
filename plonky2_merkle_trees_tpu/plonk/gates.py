"""Gate set for the TPU-native plonk engine.

Design: one gate instance per row; per-row preprocessed data = one 0/1
selector column per gate type + 2 generic constant operands.  Constraint
degree <= 8 (9 for the permutation argument), matching a degree-8N quotient.

Gates:
* ArithmeticGate — 8 ops/row of ``out = c0*x*y + c1*z`` over 32 routed wires
  (the builder batches ops sharing (c0, c1) into one row, like plonky2's
  ArithmeticGate slots).
* ConstantGate   — pins wires to the row's two constant operands.
* PublicInputGate — pins wires 0..3 to the public-inputs digest (supplied as
  instance data to constraint evaluation, plonky2-style).
* PoseidonGate   — ONE full Poseidon permutation per row, 130 wires: the
  stored values are the S-box inputs of each round (full rounds store all 12
  lanes, partial rounds store lane 0 only); every constraint is then
  degree <= 7.  This is the same wire-budget trick as plonky2's 135-wire
  PoseidonGate, re-derived for our round structure.
* NoopGate — padding.
"""

from functools import lru_cache
from typing import List

import numpy as np

from .. import field
from ..poseidon_constants import (
    WIDTH, HALF_FULL_ROUNDS, PARTIAL_ROUNDS, all_round_constants, mds_matrix,
)

P = field.P
_RC = all_round_constants()
_MDS = mds_matrix()


class Gate:
    """Base gate; subclasses define wires, constraints, witness fill."""

    id: str = "gate"
    num_constraints: int = 0

    def eval(self, alg, wires, constants, pi_hash) -> List:
        """Return the list of constraint values (alg elements).

        ``wires``: indexable of per-column values; ``constants``: the row's
        two constant operands (alg values); ``pi_hash``: 4 alg values."""
        raise NotImplementedError

    def fill_row(self, get, setv, row, constants):
        """Witness generation for this row: ``get(col)`` reads a wire value
        (python int), ``setv(col, value)`` writes one."""


class NoopGate(Gate):
    id = "noop"
    num_constraints = 0

    def eval(self, alg, wires, constants, pi_hash):
        return []


class ArithmeticGate(Gate):
    """8 slots of out = c0 * x * y + c1 * z; wires [4s..4s+4) = x,y,z,out."""

    id = "arithmetic"
    NUM_OPS = 8
    num_constraints = NUM_OPS

    def eval(self, alg, wires, constants, pi_hash):
        c0, c1 = constants[0], constants[1]
        out = []
        for s in range(self.NUM_OPS):
            x, y, z, o = (wires[4 * s + i] for i in range(4))
            expected = alg.add(alg.mul(c0, alg.mul(x, y)), alg.mul(c1, z))
            out.append(alg.sub(o, expected))
        return out

    def fill_row(self, get, setv, row, constants):
        c0, c1 = constants
        for s in range(self.NUM_OPS):
            x = get(4 * s)
            if x is None:
                continue
            y = get(4 * s + 1)
            z = get(4 * s + 2)
            if y is None or z is None:
                continue
            setv(4 * s + 3, (c0 * x * y + c1 * z) % P)


class ConstantGate(Gate):
    """Wires 0 and 1 pinned to the row's constant operands."""

    id = "constant"
    NUM_SLOTS = 2
    num_constraints = NUM_SLOTS

    def eval(self, alg, wires, constants, pi_hash):
        return [alg.sub(wires[i], constants[i]) for i in range(self.NUM_SLOTS)]

    def fill_row(self, get, setv, row, constants):
        for i in range(self.NUM_SLOTS):
            setv(i, constants[i] % P)


class PublicInputGate(Gate):
    """Wires 0..3 pinned to the public-inputs digest (instance data)."""

    id = "public_input"
    num_constraints = 4

    def eval(self, alg, wires, constants, pi_hash):
        return [alg.sub(wires[i], pi_hash[i]) for i in range(4)]


# ---------------------------------------------------------------------------
# PoseidonGate
# ---------------------------------------------------------------------------

# Wire layout (all offsets within the row):
_IN = 0            # 12 routed
_OUT = 12          # 12 routed
_S1 = 24           # sbox inputs, full round 1
_S2 = 36
_S3 = 48
_PR = 60           # sbox inputs (lane 0), partial rounds 0..21
_S26 = 82          # sbox inputs, full round 26
_S27 = 94
_S28 = 106
_S29 = 118
POSEIDON_GATE_WIRES = 130

# Column order of the 118 stored wires in a native witness trace
# (native.poseidon_gate_trace / fill_row): S1 S2 S3, PR, S26..S29, OUT.
POSEIDON_TRACE_COLS = (
    [_S1 + i for i in range(12)] + [_S2 + i for i in range(12)]
    + [_S3 + i for i in range(12)] + [_PR + k for k in range(PARTIAL_ROUNDS)]
    + [_S26 + i for i in range(12)] + [_S27 + i for i in range(12)]
    + [_S28 + i for i in range(12)] + [_S29 + i for i in range(12)]
    + [_OUT + i for i in range(12)]
)


@lru_cache(maxsize=None)
def _partial_round_affine():
    """Exact affine maps through the partial phase.

    Basis e = [1, S3[0]^7..S3[11]^7, PR[0]^7..PR[21]^7]  (35 entries).
    Returns (pr_rows, s26_rows): pr_rows[k] = coefficient row (35,) for the
    value of the lane-0 S-box input of partial round k; s26_rows[i] = row for
    lane i of the round-26 S-box input.  Python-int exact arithmetic.
    """
    n_basis = 1 + WIDTH + PARTIAL_ROUNDS
    # state: (12, n_basis) affine coefficients; column 0 is the constant.
    state = [[0] * n_basis for _ in range(WIDTH)]
    # s_4 = MDS @ S3^7 + RC_4
    rc4 = _RC[12 * HALF_FULL_ROUNDS:12 * HALF_FULL_ROUNDS + 12]
    for i in range(WIDTH):
        state[i][0] = rc4[i] % P
        for j in range(WIDTH):
            state[i][1 + j] = _MDS[i][j] % P

    pr_rows = []
    for k in range(PARTIAL_ROUNDS):
        pr_rows.append(list(state[0]))
        # lane 0 becomes the fresh basis element PR_k^7
        x = [list(row) for row in state]
        x[0] = [0] * n_basis
        x[0][1 + WIDTH + k] = 1
        # next = MDS @ x + RC_{5+k}  (round 26's constants when k == 21)
        rc_next = _RC[12 * (HALF_FULL_ROUNDS + k + 1):12 * (HALF_FULL_ROUNDS + k + 1) + 12]
        nxt = [[0] * n_basis for _ in range(WIDTH)]
        for i in range(WIDTH):
            for j in range(WIDTH):
                m = _MDS[i][j]
                if m:
                    xr = x[j]
                    row = nxt[i]
                    for b in range(n_basis):
                        if xr[b]:
                            row[b] = (row[b] + m * xr[b]) % P
            nxt[i][0] = (nxt[i][0] + rc_next[i]) % P
        state = nxt

    s26_rows = [list(row) for row in state]
    return tuple(map(tuple, pr_rows)), tuple(map(tuple, s26_rows))


def _rc_row(r):
    return _RC[12 * r:12 * r + 12]


class PoseidonGate(Gate):
    """Full Poseidon permutation in one row (130 wires, degree-7 constraints)."""

    id = "poseidon"
    num_constraints = 36 + PARTIAL_ROUNDS + 12 + 36 + 12  # 118

    def eval(self, alg, wires, constants, pi_hash):
        from .algebra import BatchAlgebra
        if isinstance(alg, BatchAlgebra):
            return self._eval_batch(alg, wires)
        return self._eval_scalar(alg, wires, constants, pi_hash)

    def _eval_batch(self, alg, wires):
        """Vectorised twin of _eval_scalar: identical integer math on stacked
        (12, m)/(22, m) arrays.  The scalar walk emits ~50k array primitives
        when traced — enough to OOM the XLA compile helper; this path emits
        ~2k.  Constraint order and values are bit-identical (same exact
        mod-p arithmetic, same list order)."""
        xp = alg.xp
        from .. import poseidon as _pm

        def stack(base, count):
            return xp.stack([wires[base + i] for i in range(count)])

        def col(vals):
            return xp.asarray(np.array(vals, dtype=np.uint64))[:, None]

        def mds(arr):
            # circulant+diag MDS on the (12, m) stack (exact, same math
            # as the scalar sum of mul_consts; no transpose relayout)
            return _pm._mds_layer_cols(arr, xp)

        def full_round_check(base, prev7, rc_next):
            acc = field.add(mds(prev7), col(rc_next))
            return field.sub(stack(base, WIDTH), acc)

        blocks = []
        t = field.exp7(field.add(stack(_IN, WIDTH), col(_rc_row(0))))
        blocks.append(full_round_check(_S1, t, _rc_row(1)))
        s1_7 = field.exp7(stack(_S1, WIDTH))
        blocks.append(full_round_check(_S2, s1_7, _rc_row(2)))
        s2_7 = field.exp7(stack(_S2, WIDTH))
        blocks.append(full_round_check(_S3, s2_7, _rc_row(3)))

        # Partial phase: evaluate the SAME affine maps as
        # _partial_round_affine, but by the sequential 22-round recurrence
        # instead of the dense (34, 35) basis accumulation.  Each step is a
        # small-constant MDS pass (~26 u32 lane-muls/point) vs ~130 full
        # field muls/point for the dense form; every step is exact
        # canonical mod-p arithmetic, so the constraint values (and hence
        # all proof transcripts) are bit-identical.
        #   state_k = s-box input vector of partial round k
        #   constraint_k = PR_k - state_k[0]
        #   state_{k+1} = MDS @ (state_k with lane0 := PR_k^7) + RC_{5+k}
        s3_7 = field.exp7(stack(_S3, WIDTH))
        pr_w = stack(_PR, PARTIAL_ROUNDS)
        pr_7 = field.exp7(pr_w)
        state = field.add(mds(s3_7), col(_rc_row(HALF_FULL_ROUNDS)))
        rc_next = np.array(
            [_rc_row(HALF_FULL_ROUNDS + k + 1) for k in range(PARTIAL_ROUNDS)],
            dtype=np.uint64)                                   # (22, 12)
        if xp is np:
            lane0 = []
            for k in range(PARTIAL_ROUNDS):
                lane0.append(state[0])
                x = np.concatenate([pr_7[k:k + 1], state[1:]], axis=0)
                state = field.add(mds(x), rc_next[k][:, None])
            lane0 = np.stack(lane0)
        else:
            import jax

            def step(st, inp):
                p7k, rck = inp
                x = xp.concatenate([p7k[None, :], st[1:]], axis=0)
                return field.add(mds(x), rck[:, None]), st[0]

            state, lane0 = jax.lax.scan(
                step, state, (pr_7, xp.asarray(rc_next)))
        blocks.append(field.sub(pr_w, lane0))
        blocks.append(field.sub(stack(_S26, WIDTH), state))

        s26_7 = field.exp7(stack(_S26, WIDTH))
        blocks.append(full_round_check(_S27, s26_7, _rc_row(27)))
        s27_7 = field.exp7(stack(_S27, WIDTH))
        blocks.append(full_round_check(_S28, s27_7, _rc_row(28)))
        s28_7 = field.exp7(stack(_S28, WIDTH))
        blocks.append(full_round_check(_S29, s28_7, _rc_row(29)))
        s29_7 = field.exp7(stack(_S29, WIDTH))
        blocks.append(field.sub(stack(_OUT, WIDTH), mds(s29_7)))

        out = []
        for blk in blocks:
            out.extend(blk[i] for i in range(blk.shape[0]))
        return out

    def _eval_scalar(self, alg, wires, constants, pi_hash):
        cs = []
        rc0 = _rc_row(0)
        # t_j = (IN_j + rc0_j)^7
        t = [alg.exp7(alg.add_const(wires[_IN + j], rc0[j])) for j in range(WIDTH)]

        def full_round_check(base_offset, prev7, rc_next):
            for i in range(WIDTH):
                acc = alg.constant(rc_next[i])
                for j in range(WIDTH):
                    acc = alg.add(acc, alg.mul_const(prev7[j], _MDS[i][j]))
                cs.append(alg.sub(wires[base_offset + i], acc))

        # full rounds 1..3: stored sbox inputs S1,S2,S3
        full_round_check(_S1, t, _rc_row(1))
        s1_7 = [alg.exp7(wires[_S1 + j]) for j in range(WIDTH)]
        full_round_check(_S2, s1_7, _rc_row(2))
        s2_7 = [alg.exp7(wires[_S2 + j]) for j in range(WIDTH)]
        full_round_check(_S3, s2_7, _rc_row(3))

        # partial phase: affine in [1, S3^7, PR^7]
        pr_rows, s26_rows = _partial_round_affine()
        s3_7 = [alg.exp7(wires[_S3 + j]) for j in range(WIDTH)]
        pr_7 = [alg.exp7(wires[_PR + k]) for k in range(PARTIAL_ROUNDS)]
        basis = [None] + s3_7 + pr_7  # index 0 is the constant 1

        def affine_eval(row):
            acc = alg.constant(row[0])
            for b in range(1, len(row)):
                if row[b]:
                    acc = alg.add(acc, alg.mul_const(basis[b], row[b]))
            return acc

        for k in range(PARTIAL_ROUNDS):
            cs.append(alg.sub(wires[_PR + k], affine_eval(pr_rows[k][:1 + WIDTH + k])))
        for i in range(WIDTH):
            cs.append(alg.sub(wires[_S26 + i], affine_eval(s26_rows[i])))

        # full rounds 27..29 + output
        s26_7 = [alg.exp7(wires[_S26 + j]) for j in range(WIDTH)]
        full_round_check(_S27, s26_7, _rc_row(27))
        s27_7 = [alg.exp7(wires[_S27 + j]) for j in range(WIDTH)]
        full_round_check(_S28, s27_7, _rc_row(28))
        s28_7 = [alg.exp7(wires[_S28 + j]) for j in range(WIDTH)]
        full_round_check(_S29, s28_7, _rc_row(29))
        s29_7 = [alg.exp7(wires[_S29 + j]) for j in range(WIDTH)]
        full_round_check(_OUT, s29_7, [0] * WIDTH)
        return cs

    def fill_row(self, get, setv, row, constants):
        state = [get(_IN + i) for i in range(WIDTH)]
        if any(v is None for v in state):
            raise ValueError(f"Poseidon gate at row {row}: inputs not set")

        from .. import poseidon as _pm
        nat = _pm._native()
        if nat:
            # native trace: ~100x the python walk (dominates witness gen of
            # hash-heavy circuits: 6.3s -> ~0.1s for a degree-2^15 circuit)
            tr = nat.poseidon_gate_trace(state)
            k = 0
            for base, cnt in ((_S1, 12), (_S2, 12), (_S3, 12),
                              (_PR, PARTIAL_ROUNDS), (_S26, 12), (_S27, 12),
                              (_S28, 12), (_S29, 12), (_OUT, 12)):
                for i in range(cnt):
                    setv(base + i, int(tr[k]))
                    k += 1
            return

        def sbox(x):
            x2 = x * x % P
            x3 = x2 * x % P
            return x3 * x3 % P * x % P

        rnd = 0
        stores = {1: _S1, 2: _S2, 3: _S3, 26: _S26, 27: _S27, 28: _S28, 29: _S29}
        for phase, count in ((0, HALF_FULL_ROUNDS), (1, PARTIAL_ROUNDS),
                             (0, HALF_FULL_ROUNDS)):
            for _ in range(count):
                rc = _rc_row(rnd)
                s = [(x + rc[i]) % P for i, x in enumerate(state)]
                # s is the sbox input of round rnd — store where required
                if rnd in stores:
                    for i in range(WIDTH):
                        setv(stores[rnd] + i, s[i])
                if phase == 1:
                    setv(_PR + (rnd - HALF_FULL_ROUNDS), s[0])
                    x = [sbox(s[0])] + s[1:]
                else:
                    x = [sbox(v) for v in s]
                state = [sum(_MDS[i][j] * x[j] for j in range(WIDTH)) % P
                         for i in range(WIDTH)]
                rnd += 1
        for i in range(WIDTH):
            setv(_OUT + i, state[i])


def poseidon_gate_trace_batch_np(states: np.ndarray) -> np.ndarray:
    """Pure-numpy batched twin of ``native.poseidon_gate_trace_batch``:
    (n, 12) gate inputs -> (n, 118) stored wires in POSEIDON_TRACE_COLS
    order (S1 S2 S3, PR, S26..S29, OUT).

    Fallback for the vectorised witness engine when the native C++ library
    is unavailable (e.g. checkpoint-loaded circuits on a box with no g++) —
    same exact mod-p walk as PoseidonGate.fill_row, batched."""
    from .. import field, poseidon as _pm
    state = np.ascontiguousarray(states, dtype=np.uint64)
    n = state.shape[0]
    seg = {}
    pr = np.empty((n, PARTIAL_ROUNDS), dtype=np.uint64)
    stores = {1: "S1", 2: "S2", 3: "S3", 26: "S26", 27: "S27",
              28: "S28", 29: "S29"}
    rnd = 0
    with np.errstate(over="ignore"):
        for phase, count in ((0, HALF_FULL_ROUNDS), (1, PARTIAL_ROUNDS),
                             (0, HALF_FULL_ROUNDS)):
            for _ in range(count):
                rc = np.array(_rc_row(rnd), dtype=np.uint64)
                s = field.add(state, rc[None, :])
                if rnd in stores:
                    seg[stores[rnd]] = s
                if phase == 1:
                    pr[:, rnd - HALF_FULL_ROUNDS] = s[:, 0]
                    x = s.copy()
                    x[:, 0] = field.exp7(s[:, 0])
                else:
                    x = field.exp7(s)
                state = _pm._mds_layer(x, np)
                rnd += 1
    return np.concatenate(
        [seg["S1"], seg["S2"], seg["S3"], pr,
         seg["S26"], seg["S27"], seg["S28"], seg["S29"], state], axis=1)


# Registry: selector column per gate type, in this order.
GATE_REGISTRY = [ArithmeticGate(), ConstantGate(), PublicInputGate(),
                 PoseidonGate(), NoopGate()]
GATE_INDEX = {g.id: i for i, g in enumerate(GATE_REGISTRY)}
NUM_SELECTORS = len(GATE_REGISTRY)
NUM_GATE_CONSTANTS = 2
