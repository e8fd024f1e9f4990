"""'I know x^3 - 2x^2 + 7x + 11' (reference examples/pol.rs, same gate calls:
cube / square / mul_const / add_const / add; NEG_ONE as the -2x^2 trick)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.plonk import CircuitBuilder, PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    a = builder.cube(x)
    b = builder.square(x)
    b1 = builder.mul_const(2, b)
    b2 = builder.mul_const(field.NEG_ONE, b1)
    c = builder.mul_const(7, x)
    d = builder.add(a, b2)
    e = builder.add_const(c, 11)
    f = builder.add(d, e)
    builder.register_public_input(x)
    builder.register_public_input(f)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 1)
    pw.set_target(f, 17)  # change to 19 and the prover panics (set-twice)
    proof = data.prove(pw)
    print(f"I know x^3 - 2x^2 + 7x + 11 for {proof.public_inputs[0]}, "
          f"it's {proof.public_inputs[1]}")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
