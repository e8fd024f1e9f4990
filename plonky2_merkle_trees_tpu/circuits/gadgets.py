"""In-circuit gadget library — parity with reference src/mmr/common.rs.

SOUNDNESS NOTE (reference quirk, SURVEY.md §2.4.1): the reference's
``equal`` combines the four digest-element equalities with OR, not AND
(common.rs:13-15) — two digests compare "equal" if ANY single element
matches.  Every reference verifier circuit inherits this bug in its
peak-membership check.  We reproduce the gadget faithfully for behavioural
parity and additionally provide ``equal_strict`` (AND semantics); the
circuit constructors accept ``strict_equal=True`` to opt into the sound
variant.
"""

from ..field import P
from ..plonk.builder import BoolTarget, CircuitBuilder, HashOutTarget

GOLDILOCKS_FIELD_ORDER = P  # reference src/mmr/common.rs:3


def equal(builder: CircuitBuilder, first: HashOutTarget,
          second: HashOutTarget) -> BoolTarget:
    """Reference-faithful digest comparison (OR of element equalities;
    common.rs:5-16)."""
    elm0 = builder.is_equal(first.elements[0], second.elements[0])
    elm1 = builder.is_equal(first.elements[1], second.elements[1])
    elm2 = builder.is_equal(first.elements[2], second.elements[2])
    elm3 = builder.is_equal(first.elements[3], second.elements[3])
    elm0_or_elm1 = builder.or_(elm0, elm1)
    elm2_or_elm3 = builder.or_(elm2, elm3)
    return builder.or_(elm0_or_elm1, elm2_or_elm3)


def equal_strict(builder: CircuitBuilder, first: HashOutTarget,
                 second: HashOutTarget) -> BoolTarget:
    """Sound AND-combined digest equality (the fix for §2.4.1)."""
    bits = [builder.is_equal(a, b)
            for a, b in zip(first.elements, second.elements)]
    acc = bits[0]
    for b in bits[1:]:
        acc = builder.and_(acc, b)
    return acc


def or_list(builder: CircuitBuilder, ins) -> BoolTarget:
    """Balanced recursive OR-tree over BoolTargets (common.rs:18-38)."""
    ins = list(ins)
    assert len(ins) > 0
    if len(ins) == 1:
        return ins[0]
    if len(ins) == 2:
        return builder.or_(ins[0], ins[1])
    pairs = []
    for i in range(0, len(ins), 2):
        pair = ins[i:i + 2]
        pairs.append(builder.or_(pair[0], pair[1]) if len(pair) > 1 else pair[0])
    return or_list(builder, pairs)


def pick_hash(builder: CircuitBuilder, option1: HashOutTarget,
              option2: HashOutTarget, pick_left: BoolTarget) -> HashOutTarget:
    """4-lane mux: pick_left ? option1 : option2, via sel*a + (1-sel)*b
    (common.rs:42-58, same mul / mul_add shape)."""
    opposite = builder.not_(pick_left)
    elements = []
    for i in range(4):
        t = builder.mul(option2.elements[i], opposite.target)
        elements.append(builder.mul_add(option1.elements[i], pick_left.target, t))
    return HashOutTarget(elements)
