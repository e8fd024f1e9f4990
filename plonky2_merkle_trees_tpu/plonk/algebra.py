"""Evaluation algebras: one gate-constraint implementation, two executions.

Gate constraints are written against this tiny interface and run in two
contexts:

* ``BatchAlgebra`` — values are (n_points,) uint64 base-field arrays
  (numpy or jnp); used by the prover to evaluate every constraint over the
  whole quotient LDE domain in one vectorised pass (TPU path).
* ``ExtAlgebra``  — values are host ``ExtensionField`` scalars; used by the
  verifier (and later the recursive circuit generator) to evaluate the same
  constraints at the opening point zeta.
"""

import numpy as np

from .. import field
from .field_ext import ExtensionField


class BatchAlgebra:
    """Vectorised base-field algebra over (n_points,) uint64 arrays."""

    def __init__(self, xp, n_points: int):
        self.xp = xp
        self.n_points = n_points

    def constant(self, c: int):
        return self.xp.full((self.n_points,), np.uint64(c % field.P), dtype=self.xp.uint64)

    def add(self, a, b):
        return field.add(a, b)

    def sub(self, a, b):
        return field.sub(a, b)

    def mul(self, a, b):
        return field.mul(a, b)

    def mul_const(self, a, c: int):
        c = c % field.P
        if c < (1 << 32):
            return field.mul_small(a, c)
        return field.mul(a, self.constant(c))

    def add_const(self, a, c: int):
        return field.add(a, self.constant(c))

    def exp7(self, a):
        return field.exp7(a)


class RecordingAlgebra:
    """Records the (circuit-static) op sequence of a constraint evaluation
    as a straight-line tape of extension-field ops over register ids.

    Values are plain ``int`` register indices.  The recorded tape is
    replayed by the native library's ``gp_ext_tape`` (or the numpy
    fallback in ``run_ext_tape``) with fresh input values per proof —
    turning the verifier's ~12k Python ``ExtensionField`` operations into
    one C call (see plonk/verifier.py).
    """

    ADD, SUB, MUL, EXP7 = 0, 1, 2, 3

    def __init__(self):
        self.n_regs = 0
        self.instrs = []        # (op, dst, a, b) int rows
        self.const_regs = {}    # value -> register id
        self.const_inits = []   # (reg, a0, a1)
        self.input_regs = []    # registers to fill per run, creation order

    def _new_reg(self) -> int:
        r = self.n_regs
        self.n_regs += 1
        return r

    def input(self) -> int:
        r = self._new_reg()
        self.input_regs.append(r)
        return r

    def constant(self, c: int) -> int:
        c = c % field.P
        r = self.const_regs.get(c)
        if r is None:
            r = self._new_reg()
            self.const_regs[c] = r
            self.const_inits.append((r, c, 0))
        return r

    def _emit(self, op: int, a: int, b: int) -> int:
        d = self._new_reg()
        self.instrs.append((op, d, a, b))
        return d

    def add(self, a, b):
        return self._emit(self.ADD, a, b)

    def sub(self, a, b):
        return self._emit(self.SUB, a, b)

    def mul(self, a, b):
        return self._emit(self.MUL, a, b)

    def mul_const(self, a, c: int):
        return self._emit(self.MUL, a, self.constant(c))

    def add_const(self, a, c: int):
        return self._emit(self.ADD, a, self.constant(c))

    def exp7(self, a):
        return self._emit(self.EXP7, a, a)


class ExtAlgebra:
    """Host scalar algebra over GF(p^2)."""

    def constant(self, c: int):
        return ExtensionField(c)

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, b):
        return a * b

    def mul_const(self, a, c: int):
        return a * ExtensionField(c)

    def add_const(self, a, c: int):
        return a + ExtensionField(c)

    def exp7(self, a):
        a2 = a * a
        a3 = a2 * a
        return a3 * a3 * a
