from .gadgets import GOLDILOCKS_FIELD_ORDER, equal, equal_strict, or_list, pick_hash  # noqa: F401
from .merkle import verify_merkle_proof_circuit, verify_merkle_proof_circuit_tiny  # noqa: F401
from .mmr import verify_mmr_proof_circuit, verify_naive_mmr_proof_circuit  # noqa: F401
