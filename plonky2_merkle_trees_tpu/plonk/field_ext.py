"""Quadratic extension GF(p^2) = GF(p)[X]/(X^2 - W), W = 7.

The reference's circuits all use D = 2 (e.g. mmr_plonky2_verifier.rs:18);
plonky2's GoldilocksField quadratic extension uses the non-residue W = 7
(same constant as the multiplicative group generator).  FRI challenges,
the opening point zeta, and the combined FRI polynomial all live here.

Two representations:
* ``ExtensionField`` — host scalar (pair of python ints), operator-overloaded,
  used in the challenger / verifier logic where values are O(1) per proof;
* vectorised (..., 2) uint64 arrays via the ``ext_*`` functions, used in the
  batched FRI fold / combine kernels.
"""

import numpy as np

from .. import field

W = 7  # non-residue: 7^((p-1)/2) == p - 1 (checked in tests)
D = 2


class ExtensionField:
    """Host scalar in GF(p^2): a0 + a1*X with X^2 = W."""

    __slots__ = ("a0", "a1")

    def __init__(self, a0: int, a1: int = 0):
        self.a0 = a0 % field.P
        self.a1 = a1 % field.P

    # -- arithmetic -----------------------------------------------------------

    def __add__(self, other):
        other = _coerce(other)
        return ExtensionField(self.a0 + other.a0, self.a1 + other.a1)

    __radd__ = __add__

    def __sub__(self, other):
        other = _coerce(other)
        return ExtensionField(self.a0 - other.a0, self.a1 - other.a1)

    def __rsub__(self, other):
        return _coerce(other) - self

    def __neg__(self):
        return ExtensionField(-self.a0, -self.a1)

    def __mul__(self, other):
        other = _coerce(other)
        a0, a1, b0, b1 = self.a0, self.a1, other.a0, other.a1
        return ExtensionField(a0 * b0 + W * a1 * b1, a0 * b1 + a1 * b0)

    __rmul__ = __mul__

    def inverse(self) -> "ExtensionField":
        norm = (self.a0 * self.a0 - W * self.a1 * self.a1) % field.P
        inv = field.h_inverse(norm)
        return ExtensionField(self.a0 * inv, -self.a1 * inv)

    def __truediv__(self, other):
        return self * _coerce(other).inverse()

    def __pow__(self, e: int):
        result = ExtensionField(1)
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def __eq__(self, other):
        other = _coerce(other)
        return self.a0 == other.a0 and self.a1 == other.a1

    def __hash__(self):
        return hash((self.a0, self.a1))

    def __repr__(self):
        return f"Ext({self.a0}, {self.a1})"

    def is_zero(self) -> bool:
        return self.a0 == 0 and self.a1 == 0

    def to_basefield_array(self) -> list:
        return [self.a0, self.a1]

    @staticmethod
    def from_basefield_array(arr) -> "ExtensionField":
        return ExtensionField(int(arr[0]), int(arr[1]))


def _coerce(v) -> ExtensionField:
    if isinstance(v, ExtensionField):
        return v
    if isinstance(v, (int, np.integer)):
        return ExtensionField(int(v))
    raise TypeError(f"cannot coerce {type(v)} to ExtensionField")


# -- vectorised (..., 2) ops ------------------------------------------------

def ext_add(a, b):
    return field.add(a, b)


def ext_sub(a, b):
    return field.sub(a, b)


def ext_mul(a, b):
    """(..., 2) x (..., 2) extension multiply."""
    xp = field._xp(a)
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = field.add(field.mul(a0, b0), field.mul_small(field.mul(a1, b1), W))
    c1 = field.add(field.mul(a0, b1), field.mul(a1, b0))
    return xp.stack([c0, c1], axis=-1)


def ext_scalar_mul(a, s: ExtensionField):
    """(..., 2) array times a host extension scalar."""
    xp = field._xp(a)
    s_arr = xp.asarray(np.array([s.a0, s.a1], dtype=np.uint64))
    return ext_mul(a, xp.broadcast_to(s_arr, a.shape))


def base_to_ext(a):
    """(...,) base-field array -> (..., 2) extension array."""
    xp = field._xp(a)
    return xp.stack([a, xp.zeros_like(a)], axis=-1)


def ext_inv_vec(a):
    """(..., 2) vectorised extension inverse: conj(a) / (a0^2 - W*a1^2)
    (the norm map to the base field; inverse is value-unique, so any
    implementation is bit-compatible).  Zero maps to zero."""
    xp = field._xp(a)
    a0, a1 = a[..., 0], a[..., 1]
    norm = field.sub(field.mul(a0, a0), field.mul_small(field.mul(a1, a1), W))
    ninv = field.inv_vec(norm)
    return xp.stack([field.mul(a0, ninv), field.mul(field.neg(a1), ninv)],
                    axis=-1)


def ext_powers_host(base: ExtensionField, count: int) -> np.ndarray:
    """(count, 2) numpy array [1, base, base^2, ...] (host scalar chain)."""
    out = np.empty((count, 2), dtype=np.uint64)
    cur = ExtensionField(1)
    for i in range(count):
        out[i] = (cur.a0, cur.a1)
        cur = cur * base
    return out
