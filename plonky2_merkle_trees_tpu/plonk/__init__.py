"""Plonky2-style SNARK engine over Goldilocks, TPU-first.

Re-implements the slice of plonky2 0.1.3 the reference consumes
(SURVEY.md §2.2): circuit builder DSL, witness generation, LDE via radix-2
NTT, Poseidon Merkle-cap commitments, the plonk permutation argument,
quotient polynomials, FRI, and a Poseidon-sponge Fiat-Shamir challenger.
The protocol family and parameter defaults match plonky2's
standard_recursion_config; proof objects are self-consistently verifiable
by the native verifier in this package.
"""

from .config import CircuitConfig, FriConfig  # noqa: F401
from .field_ext import ExtensionField  # noqa: F401
from .builder import CircuitBuilder, HashOutTarget, BoolTarget  # noqa: F401
from .witness import PartialWitness, WitnessConflict  # noqa: F401
from .proof import ProofWithPublicInputs, proof_to_json, proof_from_json  # noqa: F401


def prove_pipelined(jobs, mesh=None):
    """Pipeline-parallel batch prover over independent (circuit_data,
    partial_witness) jobs; see plonk.device.prove_pipelined."""
    from .device import prove_pipelined as _impl
    return _impl(jobs, mesh=mesh)
