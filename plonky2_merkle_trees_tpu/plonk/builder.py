"""Circuit builder DSL.

Covers the plonky2 ``CircuitBuilder`` surface the reference consumes
(SURVEY.md §2.2): virtual targets/hashes/bools, Poseidon hashing gadgets
(hash_or_noop's <=4 noop rule included), arithmetic ops, is_equal / or /
not / select, connect (copy constraints), public-input registration, and
``build()`` producing preprocessed circuit data.

Structure produced per row: one gate instance + 2 constant operands; copy
constraints tracked with a union-find over targets and wire cells and
compiled into plonk sigma tables at build time.
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .. import field, poseidon
from ..poseidon_constants import RATE, WIDTH
from .config import CircuitConfig
from .gates import (
    GATE_REGISTRY, GATE_INDEX, NUM_GATE_CONSTANTS,
    ArithmeticGate, ConstantGate, NoopGate, PoseidonGate, PublicInputGate,
)
from .witness import WitnessStore

P = field.P


@dataclass
class HashOutTarget:
    elements: List[int]  # 4 targets

    @staticmethod
    def from_vec(targets):
        assert len(targets) == 4
        return HashOutTarget(list(targets))


@dataclass
class BoolTarget:
    target: int


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


class CircuitBuilder:
    def __init__(self, config: Optional[CircuitConfig] = None):
        self.config = config or CircuitConfig.standard_recursion_config()
        self.rows: List[Tuple[object, Tuple[int, int]]] = []  # (gate, constants)
        self.uf = _UnionFind()
        self.generators: List = []     # callables (WitnessStore) -> bool (progress)
        self.gen_descs: List = []      # structured twins of the closures, for the
                                       # vectorised witness engine (prover.py)
        self.next_target = 0
        self.public_inputs: List[int] = []
        self._constant_cache = {}
        self._arith_slots = {}         # (c0, c1) -> (row, next_slot)
        self._const_slots = None       # (row, next_slot)
        self._built = False

    # -- targets --------------------------------------------------------------

    def add_virtual_target(self) -> int:
        t = self.next_target
        self.next_target += 1
        return t

    def add_virtual_targets(self, n: int) -> List[int]:
        return [self.add_virtual_target() for _ in range(n)]

    def add_virtual_hash(self) -> HashOutTarget:
        return HashOutTarget(self.add_virtual_targets(4))

    def add_virtual_bool_target_safe(self) -> BoolTarget:
        """Virtual bool with the b*b == b constraint (plonky2 'safe')."""
        b = self.add_virtual_target()
        self.assert_bool_target(b)
        return BoolTarget(b)

    def add_virtual_bool_target_unsafe(self) -> BoolTarget:
        return BoolTarget(self.add_virtual_target())

    # -- rows / placement -------------------------------------------------------

    def _add_row(self, gate, constants=(0, 0)) -> int:
        self.rows.append((gate, (constants[0] % P, constants[1] % P)))
        return len(self.rows) - 1

    def _place(self, target: int, row: int, col: int) -> None:
        self.uf.union(("t", target), ("c", row, col))

    def _wire_target(self, row: int, col: int) -> int:
        t = self.add_virtual_target()
        self._place(t, row, col)
        return t

    # -- constants ---------------------------------------------------------------

    def constant(self, value: int) -> int:
        value = value % P
        if value in self._constant_cache:
            return self._constant_cache[value]
        if self._const_slots is None or self._const_slots[1] >= ConstantGate.NUM_SLOTS:
            row = self._add_row(ConstantGate(), (value, 0))
            self._const_slots = (row, 0)
        row, slot = self._const_slots
        gate, consts = self.rows[row]
        consts = list(consts)
        consts[slot] = value
        self.rows[row] = (gate, tuple(consts))
        self._const_slots = (row, slot + 1)
        t = self._wire_target(row, slot)

        def gen(w, row=row, slot=slot, value=value):
            w.set_wire(row, slot, value)
            return True
        self.generators.append(gen)
        self.gen_descs.append(("const", row, slot, value))
        self._constant_cache[value] = t
        return t

    def zero(self) -> int:
        return self.constant(0)

    def one(self) -> int:
        return self.constant(1)

    def neg_one(self) -> int:
        return self.constant(P - 1)

    # -- arithmetic ----------------------------------------------------------------

    def arithmetic(self, c0: int, c1: int, x: int, y: int, z: int) -> int:
        """out = c0 * x * y + c1 * z — one slot of an ArithmeticGate row."""
        c0, c1 = c0 % P, c1 % P
        key = (c0, c1)
        row_slot = self._arith_slots.get(key)
        if row_slot is None or row_slot[1] >= ArithmeticGate.NUM_OPS:
            row = self._add_row(ArithmeticGate(), (c0, c1))
            row_slot = (row, 0)
        row, slot = row_slot
        self._arith_slots[key] = (row, slot + 1)
        base = 4 * slot
        self._place(x, row, base)
        self._place(y, row, base + 1)
        self._place(z, row, base + 2)
        out = self._wire_target(row, base + 3)

        def gen(w, x=x, y=y, z=z, out=out, c0=c0, c1=c1):
            xv, yv, zv = w.get_target(x), w.get_target(y), w.get_target(z)
            if xv is None or yv is None or zv is None:
                return False
            w.set_target(out, (c0 * xv * yv + c1 * zv) % P)
            return True
        self.generators.append(gen)
        self.gen_descs.append(("arith", x, y, z, out, c0, c1))
        return out

    def mul(self, a: int, b: int) -> int:
        return self.arithmetic(1, 0, a, b, a)

    def mul_add(self, a: int, b: int, c: int) -> int:
        return self.arithmetic(1, 1, a, b, c)

    def mul_const(self, c: int, a: int) -> int:
        return self.arithmetic(c, 0, a, self.one(), a)

    def add(self, a: int, b: int) -> int:
        return self.arithmetic(1, 1, a, self.one(), b)

    def add_const(self, a: int, c: int) -> int:
        return self.arithmetic(1, 1, a, self.one(), self.constant(c))

    def add_many(self, terms) -> int:
        terms = list(terms)
        acc = terms[0]
        for t in terms[1:]:
            acc = self.add(acc, t)
        return acc

    def sub(self, a: int, b: int) -> int:
        return self.arithmetic(P - 1, 1, b, self.one(), a)

    def square(self, a: int) -> int:
        return self.mul(a, a)

    def cube(self, a: int) -> int:
        return self.mul(self.square(a), a)

    def exp_u64(self, a: int, e: int) -> int:
        result = self.one()
        base = a
        while e:
            if e & 1:
                result = self.mul(result, base)
            if e > 1:
                base = self.mul(base, base)
            e >>= 1
        return result

    # -- logic ------------------------------------------------------------------

    def assert_bool_target(self, t: int) -> None:
        # t*t - t routed to zero
        sq = self.arithmetic(1, P - 1, t, t, t)  # t*t - t
        self.connect(sq, self.zero())

    def assert_bool(self, b: BoolTarget) -> None:
        self.assert_bool_target(b.target)

    def not_(self, b: BoolTarget) -> BoolTarget:
        return BoolTarget(self.sub(self.one(), b.target))

    def and_(self, a: BoolTarget, b: BoolTarget) -> BoolTarget:
        return BoolTarget(self.mul(a.target, b.target))

    def or_(self, a: BoolTarget, b: BoolTarget) -> BoolTarget:
        # a + b - a*b
        ab = self.mul(a.target, b.target)
        return BoolTarget(self.sub(self.add(a.target, b.target), ab))

    def is_equal(self, x: int, y: int) -> BoolTarget:
        """b = (x == y), via the standard inverse-witness gadget."""
        b = self.add_virtual_target()
        inv = self.add_virtual_target()
        d = self.sub(x, y)

        def gen(w, x=x, y=y, b=b, inv=inv):
            xv, yv = w.get_target(x), w.get_target(y)
            if xv is None or yv is None:
                return False
            dv = (xv - yv) % P
            if dv == 0:
                w.set_target(b, 1)
                w.set_target(inv, 0)
            else:
                w.set_target(b, 0)
                w.set_target(inv, field.h_inverse(dv))
            return True
        self.generators.append(gen)
        self.gen_descs.append(("eq", x, y, b, inv))

        # constraints: d * inv == 1 - b     and    d * b == 0
        d_inv = self.mul(d, inv)
        self.connect(d_inv, self.sub(self.one(), b))
        d_b = self.mul(d, b)
        self.connect(d_b, self.zero())
        return BoolTarget(b)

    def select(self, b: BoolTarget, x: int, y: int) -> int:
        """b ? x : y  ==  b*(x - y) + y."""
        diff = self.sub(x, y)
        return self.mul_add(b.target, diff, y)

    # -- hashing -------------------------------------------------------------------

    def permute(self, inputs: List[int]) -> List[int]:
        """One Poseidon permutation row; returns the 12 output targets."""
        assert len(inputs) == WIDTH
        gate = PoseidonGate()
        row = self._add_row(gate)
        for i, t in enumerate(inputs):
            self._place(t, row, i)
        outputs = [self._wire_target(row, 12 + i) for i in range(WIDTH)]

        def gen(w, row=row, gate=gate, inputs=tuple(inputs)):
            if any(w.get_target(t) is None for t in inputs):
                return False
            gate.fill_row(lambda c: w.get_wire(row, c),
                          lambda c, v: w.set_wire(row, c, v), row, (0, 0))
            return True
        self.generators.append(gen)
        self.gen_descs.append(("poseidon", row, tuple(inputs)))
        return outputs

    def hash_n_to_m_no_pad(self, inputs: List[int], num_outputs: int = 4) -> List[int]:
        state = [self.zero()] * WIDTH
        for start in range(0, len(inputs), RATE):
            chunk = inputs[start:start + RATE]
            state = list(chunk) + state[len(chunk):]
            state = self.permute(state)
        outputs = []
        while True:
            outputs.extend(state[:RATE])
            if len(outputs) >= num_outputs:
                return outputs[:num_outputs]
            state = self.permute(state)

    def hash_n_to_hash_no_pad(self, inputs: List[int]) -> HashOutTarget:
        return HashOutTarget(self.hash_n_to_m_no_pad(inputs, 4))

    def hash_or_noop(self, inputs: List[int]) -> HashOutTarget:
        """<= 4 inputs: zero-padded, UNhashed (the noop rule the reference's
        test vectors depend on); otherwise a real sponge."""
        if len(inputs) <= 4:
            padded = list(inputs) + [self.zero()] * (4 - len(inputs))
            return HashOutTarget(padded)
        return self.hash_n_to_hash_no_pad(inputs)

    # -- wiring / public inputs ------------------------------------------------------

    def connect(self, a: int, b: int) -> None:
        self.uf.union(("t", a), ("t", b))

    def connect_hashes(self, a: HashOutTarget, b: HashOutTarget) -> None:
        for x, y in zip(a.elements, b.elements):
            self.connect(x, y)

    def register_public_input(self, t: int) -> None:
        self.public_inputs.append(t)

    def register_public_inputs(self, ts) -> None:
        for t in ts:
            self.register_public_input(t)

    # -- recursion (reference API parity: builder.add_virtual_proof_with_pis /
    #    add_virtual_verifier_data / verify_proof) ---------------------------------

    def add_virtual_proof_with_pis(self, inner_common):
        from .recursion import add_virtual_proof_with_pis
        return add_virtual_proof_with_pis(self, inner_common)

    def add_virtual_verifier_data(self, cap_height: int):
        from .recursion import add_virtual_verifier_data
        return add_virtual_verifier_data(self, cap_height)

    def verify_proof(self, proof_target, verifier_data_target, inner_common):
        from .recursion import verify_proof_circuit
        verify_proof_circuit(self, proof_target, verifier_data_target, inner_common)

    # -- build -------------------------------------------------------------------------

    def build(self, min_degree_bits: int = None):
        from .circuit_data import build_circuit_data
        assert not self._built, "builder already consumed"
        self._built = True

        # Public-input digest: in-circuit sponge over the registered PI
        # targets, routed into the PublicInputGate's first 4 wires.
        pi_digest = self.hash_n_to_hash_no_pad(list(self.public_inputs)) \
            if self.public_inputs else HashOutTarget([self.zero()] * 4)
        pi_row = self._add_row(PublicInputGate())
        for i in range(4):
            self._place(pi_digest.elements[i], pi_row, i)

        return build_circuit_data(self, min_degree_bits=min_degree_bits)
