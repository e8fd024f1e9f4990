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
