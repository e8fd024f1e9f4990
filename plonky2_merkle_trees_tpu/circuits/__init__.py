from .gadgets import GOLDILOCKS_FIELD_ORDER, equal, equal_strict, or_list, pick_hash  # noqa: F401
from .merkle import verify_merkle_proof_circuit, verify_merkle_proof_circuit_tiny  # noqa: F401
from .mmr import verify_mmr_proof_circuit, verify_naive_mmr_proof_circuit  # noqa: F401
from .mmr_recursion import (  # noqa: F401
    verify_inner_merkle_proof_circuit,
    verify_naive_inner_merkle_proof_circuit,
    complete_verification_circuit_with_inner_proof,
)
from .merkle_recursion import (  # noqa: F401
    initial_proof_circuit, recursive_step, verify_merkle_proof_circuit_and_proof,
    chain_step_circuit, uniform_chain_circuits,
    verify_merkle_proof_chain_uniform,
    expected_chain_commitment, verify_chain_binding, verifier_data_digest,
)
