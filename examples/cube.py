"""'I know x^3' — the smallest end-to-end SNARK (reference examples/cube.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plonky2_merkle_trees_tpu.plonk import CircuitBuilder, PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    cube = builder.cube(x)
    builder.register_public_input(x)
    builder.register_public_input(cube)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(cube, 27)
    proof = data.prove(pw)
    print(f"{proof.public_inputs[0]}'s cube is {proof.public_inputs[1]}")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
